"""Sky-signal model families: lensing, point sources, aberration, matched
filtering. These re-export the top-level science modules so both the
reference-style (`pixell_tpu.lensing`) and structured (`pixell_tpu.models`)
imports work."""
from .. import lensing, pointsrcs, aberration, analysis
