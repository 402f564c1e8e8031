"""trx2dy — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
YangLab-SDU/trRosettaX2-Dynamics.

The reference predicts alternative protein conformations from an MSA:
a 2D-geometry MSA transformer (trRosettaX2) emits inter-residue
distance/orientation histograms, a restrained energy-minimization folder turns
them into 3D decoys, and an iterative "dampening" loop pushes successive decoys
into alternative modes of the predicted distributions.

This package is a from-scratch TPU-first redesign:

- ``trx2dy.geometry`` — dihedral/angle/virtual-CB kernels, 6D geometry maps,
  histogram binning, NeRF backbone build via ``lax.associative_scan``.
- ``trx2dy.physics``  — the PyRosetta replacement: dense cubic-spline restraint
  potentials, centroid energy terms, and a vmapped L-BFGS minimizer so a whole
  decoy ensemble minimizes in parallel on one chip.
- ``trx2dy.models``   — Predictor2D / structure module / MSA transformer in JAX.
- ``trx2dy.dynamics`` — the dampening sampler and pipeline drivers.
- ``trx2dy.analysis`` — TM-score/RMSD (Kabsch + iterative TM superposition),
  glocon clustering, evaluation.
- ``trx2dy.parallel`` — device-mesh sharding helpers (decoy/target data
  parallelism, MSA-row sequence parallelism).
"""

__version__ = "0.1.0"
