"""Shared engine exception types (split from engine.py so the engine
mixin modules can raise them without a circular import)."""


class ExecError(ValueError):
    pass
