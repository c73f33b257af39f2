import operator
import numpy as np

def methodcaller(name, *args, **kwargs):
    return operator.methodcaller(name, *args, **kwargs)

def _norm(x):
    if hasattr(x, "to_host"):
        x = x.to_host()
    # pandas ExtensionArrays (e.g. ArrowStringArray from .values)
    if type(x).__module__.startswith("pandas"):
        x = [None if v is None or (isinstance(v, float) and v != v) else v
             for v in list(x)]
    try:
        import pandas as pd
        if isinstance(x, pd.Series):
            x = [None if (isinstance(v, float) and v != v) or v is None else v
                 for v in x.tolist()]
    except ImportError:
        pass
    if isinstance(x, np.ndarray):
        if x.dtype == object or x.dtype.kind == "f":
            return [None if v is None or (isinstance(v, float) and v != v)
                    else v for v in x.tolist()]
        return x
    if isinstance(x, (list, tuple)):
        return [None if (isinstance(v, float) and v != v) else v for v in x]
    return x

def assert_eq(got, expected):
    g, e = _norm(got), _norm(expected)
    if not hasattr(g, "__iter__") or not hasattr(e, "__iter__"):
        assert g == e, (g, e)
    elif isinstance(g, np.ndarray) or isinstance(e, np.ndarray):
        assert np.array_equal(np.asarray(g), np.asarray(e)), (g, e)
    else:
        assert list(g) == list(e), (g, e)
