import numpy as np
def adjust_gamma(image, gamma=1, gain=1):
    return gain * np.power(image, gamma)
