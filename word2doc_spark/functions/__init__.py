from word2doc_spark.functions.hashing import murmurhash3_32, murmurhash3_batch  # noqa: F401
from word2doc_spark.functions.stopwords import STOPWORDS  # noqa: F401
