def element(*a, **k): raise NotImplementedError("shim")
