from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .textfn import tokenize, normalize_ws  # noqa: F401
