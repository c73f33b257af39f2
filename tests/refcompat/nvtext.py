from custrings_tpu.nvtext import *  # noqa
