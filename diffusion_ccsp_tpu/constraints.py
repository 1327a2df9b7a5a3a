"""Constraint vocabularies for each CCSP task family.

Parity: reference ``networks/denoise_fn.py:16-25``. Each task family ("input
mode") has a fixed ordered vocabulary of binary constraint types; the denoiser
owns one MLP per type and the dataset encodes every constraint edge as an index
into the vocabulary.

Mirrored relations (``right-of``, ``bottom-of``) are dropped from the data so a
single MLP learns each symmetric pair (reference ``denoise_fn.py:25``).
"""

from __future__ import annotations

PUZZLE_CONSTRAINTS = ("in", "cfree")
ROBOT_CONSTRAINTS = ("gin", "gfree")
STABILITY_CONSTRAINTS = ("within", "supportedby", "cfree")
QUALITATIVE_CONSTRAINTS = (
    "in", "center-in", "left-in", "right-in", "top-in", "bottom-in",
    "cfree", "left-of", "top-of",
    "close-to", "away-from", "h-aligned", "v-aligned",
)
ROBOT_QUALITATIVE_CONSTRAINTS = ROBOT_CONSTRAINTS + QUALITATIVE_CONSTRAINTS
IGNORED_CONSTRAINTS = ("right-of", "bottom-of")

#: Constraint types whose argument order carries no meaning; a stored edge may
#: list the two objects in either order (reference ``envs/data_utils.py:408-424``).
UNORDERED_CONSTRAINTS = ("close-to", "away-from", "h-aligned", "v-aligned", "cfree")


def constraint_set_for_mode(input_mode: str) -> tuple[str, ...]:
    """Select the constraint vocabulary from the input mode name.

    Parity: reference ``denoise_fn.py:207-214`` (note: 'robot_qualitative'
    resolves to the composed vocabulary, checked before the bare 'robot' /
    'qualitative' prefixes).
    """
    if "robot" in input_mode and "qualitative" in input_mode:
        return ROBOT_QUALITATIVE_CONSTRAINTS
    if "robot" in input_mode:
        return ROBOT_CONSTRAINTS
    if "stability" in input_mode:
        return STABILITY_CONSTRAINTS
    if "qualitative" in input_mode:
        return QUALITATIVE_CONSTRAINTS
    return PUZZLE_CONSTRAINTS


def constraint_index(input_mode: str, name: str) -> int:
    return constraint_set_for_mode(input_mode).index(name)
