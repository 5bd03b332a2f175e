from .scatter import segment_sum, segment_mean, segment_max, segment_min, segment_softmax  # noqa
from .radial import bessel_basis, polynomial_cutoff, gaussian_smearing, radial_embedding  # noqa
from .spherical import spherical_harmonics, sh_normalization_constants  # noqa
