from .base import Engine, get_engine, reset_engine
from .inner import run_adaptive, lines_to_text

__all__ = ["Engine", "get_engine", "reset_engine", "run_adaptive", "lines_to_text"]
