"""Experimental kernels: measured research artifacts, NOT production paths.

Nothing in the shipping pipeline imports from this package; see each
module's docstring for the measured outcome that parked it.
"""

from .minwin import place_minwin
