"""Global constants.

Semantics mirror the reference constants (reference: src/openparse/consts.py:1-6)
but this engine is a from-scratch Ray-Data-native implementation.
"""

from typing import Literal

TOKENIZATION_LOWER_LIMIT = 256
TOKENIZATION_UPPER_LIMIT = 1024

# PDF-style y-up coordinates; all synthetic layout uses this system.
COORDINATE_SYSTEM: Literal["top-left", "bottom-left"] = "bottom-left"

# Delimiter joining unrelated elements inside one node's text
# (reference: src/openparse/consts.py:6).
ELEMENT_DELIMITER: str = "<br><br>"

MIN_HEADING_SIZE = 16.0

# Node token thresholds (reference: src/openparse/schemas.py:556-565).
STUB_TOKEN_LIMIT = 50

# Synthetic page geometry for the HTML layout engine (US-letter points).
PAGE_WIDTH = 612.0
PAGE_HEIGHT = 792.0
PAGE_MARGIN_X = 56.0
# Content band chosen to sit inside RemoveMetadataElements' allowed
# [10%, 90%] vertical range (79.2 .. 712.8 on a 792pt page).
PAGE_TOP_Y = 712.0  # y of the top of the first content line
PAGE_BOTTOM_Y = 82.0  # content never goes below this
