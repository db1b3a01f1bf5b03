import numpy as np
def rgb2gray(img):
    return img[..., :3] @ np.array([0.2125, 0.7154, 0.0721])
