"""24-bit angle codec (reference common/angle24.py): angles in [-pi, pi)
encoded as 24-bit integers, used by the FST output format to stash the grid
rotation inside IG1-IG4 metadata fields."""

import math

_INTERVAL = 2.0 * math.pi / 0x1000000


def encode(value: float) -> int:
    """Encode an angle (shifted into [-pi, pi)) as a 24-bit integer."""
    while value >= math.pi:
        value -= 2.0 * math.pi
    while value < -math.pi:
        value += 2.0 * math.pi
    return (round(value / _INTERVAL) + 0x800000) & 0xFFFFFF


def decode(bits: int) -> float:
    """Decode a 24-bit integer back to an angle in [-pi, pi)."""
    return ((bits & 0xFFFFFF) - 0x800000) * _INTERVAL
