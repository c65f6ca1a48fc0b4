"""Stopword set used by the n-gram filter.

Semantics contract: the 119-entry NLTK-style English stopword set of the
reference retriever (/root/reference/src/word2doc/retriever/utils.py:85-103)
— lowercase match after NFD normalization. Reproduced as data (a published
NLTK-derived list), not as code.
"""

STOPWORDS = frozenset({
    'i', 'me', 'my', 'myself', 'we', 'our', 'ours', 'ourselves', 'you', 'your',
    'yours', 'yourself', 'yourselves', 'he', 'him', 'his', 'himself', 'she',
    'her', 'hers', 'herself', 'it', 'its', 'itself', 'they', 'them', 'their',
    'theirs', 'themselves', 'what', 'which', 'who', 'whom', 'this', 'that',
    'these', 'those', 'am', 'is', 'are', 'was', 'were', 'be', 'been', 'being',
    'have', 'has', 'had', 'having', 'do', 'does', 'did', 'doing', 'a', 'an',
    'the', 'and', 'but', 'if', 'or', 'because', 'as', 'until', 'while', 'of',
    'at', 'by', 'for', 'with', 'about', 'against', 'between', 'into',
    'through', 'during', 'before', 'after', 'above', 'below', 'to', 'from',
    'up', 'down', 'in', 'out', 'on', 'off', 'over', 'under', 'again',
    'further', 'then', 'once', 'here', 'there', 'when', 'where', 'why', 'how',
    'all', 'any', 'both', 'each', 'few', 'more', 'most', 'other', 'some',
    'such', 'no', 'nor', 'not', 'only', 'own', 'same', 'so', 'than', 'too',
    'very', 's', 't', 'can', 'will', 'just', 'don', 'should', 'now', 'd',
    'll', 'm', 'o', 're', 've', 'y', 'ain', 'aren', 'couldn', 'didn',
    'doesn', 'hadn', 'hasn', 'haven', 'isn', 'ma', 'mightn', 'mustn',
    'needn', 'shan', 'shouldn', 'wasn', 'weren', 'won', 'wouldn',
    "'ll", "'re", "'ve", "n't", "'s", "'d", "'m", "''", "``",
})

# Small auxiliary sets for the language-id heuristic (public, common lists).
DE_STOPWORDS = frozenset({
    'der', 'die', 'das', 'und', 'ist', 'nicht', 'ein', 'eine', 'mit', 'auf',
    'für', 'von', 'sich', 'dem', 'den', 'des', 'ich', 'sie', 'er', 'es',
    'auch', 'aber', 'wie', 'wir', 'zu', 'im', 'aus', 'bei', 'werden', 'wird',
})
FR_STOPWORDS = frozenset({
    'le', 'la', 'les', 'des', 'une', 'un', 'et', 'est', 'pas', 'pour',
    'que', 'qui', 'dans', 'sur', 'avec', 'par', 'au', 'aux', 'du', 'ce',
    'cette', 'ses', 'son', 'nous', 'vous', 'ils', 'elles', 'mais', 'ou', 'où',
})
