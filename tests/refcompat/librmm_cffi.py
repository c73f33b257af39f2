# stub: reference tests import librmm for device-array helpers; tests that
# actually call it will fail and be skipped from the parity report
class _RMM:
    def device_array(self, *a, **k):
        raise RuntimeError("rmm not available")
    def device_array_like(self, *a, **k):
        raise RuntimeError("rmm not available")
    def to_device(self, *a, **k):
        raise RuntimeError("rmm not available")
librmm = _RMM()
