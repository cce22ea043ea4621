"""pixell_tpu: TPU-native maps-on-rectangular-pixels library.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
simonsobs/pixell: ndmap sky maps in cylindrical projections, Fourier
analysis, spherical harmonic transforms, wavelets, reprojection, lensing,
point sources, matched filters, distributed tiled maps, and visualization.
"""
__version__ = "0.1.0"

from . import utils
from . import wcsutils
from . import enmap
from . import fft
