import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import utils as _shim_utils

sys.modules["utils"] = _shim_utils

# restore 2019-era pandas behavior the reference tests were written against:
# Series.str.replace defaulted to regex=True back then
import functools
import pandas as _pd

_orig_replace = _pd.core.strings.accessor.StringMethods.replace

@functools.wraps(_orig_replace)
def _replace_regex_default(self, pat, repl, n=-1, case=None, flags=0,
                           regex=True):
    return _orig_replace(self, pat, repl, n=n, case=case, flags=flags,
                         regex=regex)

_pd.core.strings.accessor.StringMethods.replace = _replace_regex_default
