from custrings_tpu.nvcategory import *  # noqa
