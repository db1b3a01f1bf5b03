def mobilenet_v2(*a, **k): raise NotImplementedError("shim")
def resnet50(*a, **k): raise NotImplementedError("shim")
def vgg16(*a, **k): raise NotImplementedError("shim")
