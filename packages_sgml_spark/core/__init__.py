"""Pure-Python parser core (no Spark dependency).

Semantics follow SWI-Prolog packages-sgml; see per-module docstrings
for reference file:line citations.
"""

from .parser import SGMLParser, ParserOptions  # noqa: F401
from .dom import Element, SData, NData, PI, Entity  # noqa: F401
