"""h2 pipeline placeholder (implemented in the h2 milestone)."""

from __future__ import annotations


def estimate_h2(*args, **kwargs):
    raise NotImplementedError("h2 pipeline lands in the next milestone")
