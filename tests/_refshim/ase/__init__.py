class Atom:
    def __init__(self, *a, **k): pass
class Atoms:
    def __init__(self, *a, **k): pass
