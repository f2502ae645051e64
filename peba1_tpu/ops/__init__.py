from . import decompose, poly, rotate  # bootstrap imported lazily (needs keys)
