# operator modules are imported directly (e.g. `from ..operators import dedup`)
