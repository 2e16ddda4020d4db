from . import gpt2  # noqa: F401
