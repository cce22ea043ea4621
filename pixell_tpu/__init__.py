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
from . import bunch
from . import powspec
from . import resample
from . import interpol
from . import sht
from . import curvedsky
from . import uharm
from . import wavelets
from . import multimap
from . import tilemap
from . import reproject
from . import lensing
from . import aberration
from . import pointsrcs
from . import analysis
from . import distances
from . import coordinates
from . import coordsys
from . import old_aberration
from . import healpix
from . import colorize
from . import colors
from . import cgrid
from . import enplot
from . import config
from . import bench
from . import memory
from . import device
from . import array_ops
from . import fits_io
from . import ephem
from . import sites
from . import mpi
from . import mpiutils
from . import warray
from . import sqlite
from . import checkpoint
from . import parallel
