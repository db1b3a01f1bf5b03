import numpy as np
def random_noise(image, mode="gaussian", var=0.01, amount=0.05, **kw):
    rng = np.random
    img = np.asarray(image, dtype=float)
    if mode == "gaussian":
        out = img + rng.normal(0, np.sqrt(var), img.shape)
        return np.clip(out, 0, 1)
    if mode == "s&p":
        out = img.copy()
        u = rng.rand(*img.shape)
        out[u < amount / 2] = 1.0
        out[(u >= amount / 2) & (u < amount)] = 0.0
        return out
    raise NotImplementedError(mode)

def view_as_windows(arr_in, window_shape, step=1):
    import numpy as np
    if isinstance(window_shape, int):
        window_shape = (window_shape,) * arr_in.ndim
    if isinstance(step, int):
        step = (step,) * arr_in.ndim
    shape = tuple((np.array(arr_in.shape) - np.array(window_shape)) //
                  np.array(step) + 1) + tuple(window_shape)
    strides = tuple(np.array(arr_in.strides) * np.array(step)) + \
        arr_in.strides
    return np.lib.stride_tricks.as_strided(arr_in, shape, strides)
