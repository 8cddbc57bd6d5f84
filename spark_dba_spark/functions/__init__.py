from .numeric import davg, dsum, dsum_expr  # noqa: F401
from .texts import char_shingles, word_ngrams, words  # noqa: F401
from .hashing import md5_long, minhash_signature  # noqa: F401
