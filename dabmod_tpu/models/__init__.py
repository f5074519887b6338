from .modulator import (Modulator, clear_modulator_cache,  # noqa: F401
                        get_modulator, make_default_layout)
