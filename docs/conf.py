# Sphinx configuration for pixell_tpu.
import os
import sys
sys.path.insert(0, os.path.abspath(".."))

project = "pixell_tpu"
author = "pixell_tpu developers"
extensions = [
	"sphinx.ext.autodoc",
	"sphinx.ext.napoleon",
	"sphinx.ext.viewcode",
	"sphinx.ext.mathjax",
]
autodoc_member_order = "bysource"
# jax and the TPU runtime are heavyweight imports; mock them so docs build
# on any machine
autodoc_mock_imports = []
templates_path = []
exclude_patterns = ["_build"]
html_theme = "alabaster"
master_doc = "index"
