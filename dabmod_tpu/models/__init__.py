from .modulator import Modulator, make_default_layout  # noqa: F401
