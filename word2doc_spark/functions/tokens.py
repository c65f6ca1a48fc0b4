"""Tokens container ops (reference C7 —
/root/reference/src/word2doc/tokenizers/tokenizer.py:12-125).

A minimal parity container over (token, text_with_ws, span) triples:
``words(uncased)``, ``offsets``, ``slice``, ``untokenize`` and
``entity_groups`` (consecutive-tag run grouping). The retrieval path never
uses these (SURVEY §2.C7); they exist for API completeness and are pure
driver-side helpers — any Spark use would wrap them in a pandas UDF.

NER/POS annotators are external services in the reference (corenlp/spacy,
out of scope per SURVEY); ``entity_groups`` therefore takes the entity
tags as an explicit argument.
"""

from __future__ import annotations

from word2doc_spark.functions.tokenize import _REGEXP_SUBS, _REGEXP_RE, _TOKEN_RE


class Tokens:
    """data: list of (token, text_with_ws, (start, end))."""

    def __init__(self, data: list[tuple[str, str, tuple[int, int]]]):
        self.data = data

    def __len__(self) -> int:
        return len(self.data)

    def words(self, uncased: bool = False) -> list[str]:
        if uncased:
            return [t[0].lower() for t in self.data]
        return [t[0] for t in self.data]

    def offsets(self) -> list[tuple[int, int]]:
        return [t[2] for t in self.data]

    def slice(self, i: int | None = None, j: int | None = None) -> "Tokens":
        return Tokens(self.data[i:j])

    def untokenize(self) -> str:
        """Whitespace-faithful reconstruction (join of text_with_ws,
        trailing whitespace stripped — tokenizer.py:36-38)."""
        return "".join(t[1] for t in self.data).rstrip()

    def entity_groups(self, entities: list[str],
                      non_ent: str = "O") -> list[tuple[str, str]]:
        """Group consecutive tokens sharing the same (non-``non_ent``)
        entity tag → [(group_text, tag)] (tokenizer.py:106-125)."""
        if len(entities) != len(self.data):
            raise ValueError("one entity tag per token required")
        groups = []
        idx = 0
        while idx < len(entities):
            tag = entities[idx]
            if tag != non_ent:
                start = idx
                while idx < len(entities) and entities[idx] == tag:
                    idx += 1
                groups.append((self.slice(start, idx).untokenize(), tag))
            else:
                idx += 1
        return groups


def tokenize_tokens(text: str, tokenizer: str = "simple") -> Tokens:
    """Span-preserving tokenization → Tokens; token surface forms match
    the named tokenizer (incl. the regexp tokenizer's quote/dash/ellipsis
    substitutions), text_with_ws slices the ORIGINAL text up to the next
    token start (simple_tokenizer.py:31-57 semantics)."""
    if tokenizer == "simple":
        matches = list(_TOKEN_RE.finditer(text))
        toks = [m.group() for m in matches]
    elif tokenizer == "regexp":
        matches = list(_REGEXP_RE.finditer(text))
        toks = []
        for m in matches:
            token = m.group()
            groups = m.groupdict()
            for name, repl in _REGEXP_SUBS:
                if groups[name]:
                    token = repl
                    break
            toks.append(token)
    else:
        raise ValueError(f"unknown tokenizer {tokenizer!r}")
    data = []
    for i, m in enumerate(matches):
        span = m.span()
        end_ws = matches[i + 1].span()[0] if i + 1 < len(matches) else span[1]
        data.append((toks[i], text[span[0]:end_ws], span))
    return Tokens(data)
