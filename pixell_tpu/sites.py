"""Observatory site database (reference pixell/sites.py)."""
from .bunch import Bunch

sites = {
	"act":   Bunch(lat=-22.9585, lon=-67.7876, alt=5188.0),
	"so":    Bunch(lat=-22.9585, lon=-67.7876, alt=5188.0),
	"alma":  Bunch(lat=-23.0290, lon=-67.7550, alt=5058.7),
	"spt":   Bunch(lat=-89.9911, lon=-44.6500, alt=2835.0),
	"bicep": Bunch(lat=-89.9911, lon=-44.6500, alt=2835.0),
	"planck": Bunch(lat=0.0, lon=0.0, alt=1.5e9),
}

def get(name):
	"""Look up a site by name (reference sites.py:55)."""
	return sites[name.lower()]
