from .decode import DecodeConfig, generate_tokens  # noqa: F401
from .pipeline import Music2MIDI  # noqa: F401
