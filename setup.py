"""Legacy setuptools shim.

``pip install -e .`` needs the ``wheel`` package for the PEP 660 editable
path; on hosts without it (this sandbox has setuptools 65 and no wheel),
``python setup.py develop`` installs the same editable package + the
``gotrackmaster-spark`` console script from pyproject.toml metadata.
"""

from setuptools import setup

setup()
