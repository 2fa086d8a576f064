"""Sphinx configuration (mirrors reference Documentation/source/conf.py).

The in-repo, dependency-free documentation pipeline is docs/gen_api.py
(markdown from live docstrings); this scaffold serves users who have
sphinx installed and want HTML with autodoc/search.
"""
project = "ntpoly_tpu"
author = "ntpoly_tpu developers"
extensions = ["sphinx.ext.autodoc", "sphinx.ext.napoleon",
              "sphinx.ext.viewcode", "myst_parser"]
autodoc_member_order = "bysource"
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
