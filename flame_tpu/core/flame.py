"""Flame orchestrator (placeholder — full implementation lands with the
core pipeline milestone)."""


class Flame:  # pragma: no cover - stub
    def __init__(self, *args, **kwargs):
        raise NotImplementedError("core pipeline lands in a later milestone")
