"""Application layer: interactive session, headless rendering, CLI."""

from .session import Character, Session, Settings

__all__ = ["Character", "Session", "Settings"]
