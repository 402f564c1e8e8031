from trx2dy.dynamics.dampen import dampen_distribution, gaussian_smooth_bins, DampenParams
