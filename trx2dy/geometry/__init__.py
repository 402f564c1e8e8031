from trx2dy.geometry.transforms import (
    dihedral,
    bond_angle,
    virtual_cb,
    geometry_maps_6d,
)
from trx2dy.geometry.binning import bin_geometry_maps, DIST_EDGES, TORSION_EDGES, PLANAR_EDGES
