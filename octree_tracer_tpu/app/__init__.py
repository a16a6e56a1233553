"""Application layer: interactive session, headless rendering, CLI.

Submodules import lazily so CLI paths that never render (e.g. ``export``)
don't initialize a JAX backend.
"""

__all__ = ["Character", "Session", "Settings"]


def __getattr__(name):
    if name in __all__:
        from . import session

        return getattr(session, name)
    raise AttributeError(name)
