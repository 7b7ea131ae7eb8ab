"""Single-process oracle: an exact transcription of the reference engine.

Every formula and threshold below cites its source in /root/reference/.
The pytest suite asserts that the Spark engine reproduces this oracle
rank-identically (docIDs) and numerically (scores, rel tol 1e-9).

Determinism contract: the reference sorts with Python's stable ``sort``
over dict-insertion order (search_engine.py:481), which leaves tie order
unspecified across implementations.  We impose the deterministic tiebreak
``(-score, doc_id)`` on BOTH the oracle and the Spark engine (SURVEY.md
§7 hard-part (b)).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

from document_retrieval_system_spark.functions.analyzer import process_text

BM25_K1 = 1.2  # search_engine.py:445, indexer.py:275
BM25_B = 0.75  # search_engine.py:446, indexer.py:276
DEFAULT_MAX_RESULTS = 20  # app_config.yaml:33
DEFAULT_MIN_SCORE = 0.3  # app_config.yaml:34


def doc_id_of(url: str) -> str:
    """md5 of the document path/url (datasource_manager.py:246-258)."""
    return hashlib.md5(url.encode("utf-8")).hexdigest()


class OracleIndex:
    """In-memory positional inverted index (indexer.py:22-93)."""

    def __init__(self) -> None:
        self.positional_index: dict[str, list[tuple[str, int, list[int]]]] = defaultdict(list)
        self.index: dict[str, list[str]] = defaultdict(list)
        self.doc_lengths: dict[str, int] = {}
        self.doc_freqs: dict[str, int] = defaultdict(int)
        self.total_docs = 0
        self.avg_doc_length = 0.0
        self.doc_weights: dict[str, dict[str, float]] = {}

    def add_document(self, doc_id: str, tokens: list[str]) -> None:
        """indexer.py:44-93 (positions always on, as in the live path :417)."""
        if not tokens:
            return
        self.doc_lengths[doc_id] = len(tokens)
        term_freqs: dict[str, int] = defaultdict(int)
        term_positions: dict[str, list[int]] = defaultdict(list)
        for pos, token in enumerate(tokens):
            term_freqs[token] += 1
            term_positions[token].append(pos)
        for term, freq in term_freqs.items():
            if doc_id not in [t[0] for t in self.positional_index.get(term, [])]:
                self.doc_freqs[term] += 1
            self.positional_index[term].append((doc_id, freq, term_positions[term]))
            if doc_id not in self.index[term]:
                self.index[term].append(doc_id)
        self.total_docs = len(self.doc_lengths)
        if self.total_docs > 0:
            self.avg_doc_length = sum(self.doc_lengths.values()) / self.total_docs

    # point lookups (indexer.py:145-243)
    def get_postings(self, term: str) -> list[str]:
        return self.index.get(term, [])

    def get_positional_postings(self, term: str):
        return self.positional_index.get(term, [])

    def get_doc_freq(self, term: str) -> int:
        return self.doc_freqs.get(term, 0)

    def get_term_freq(self, term: str, doc_id: str) -> int:
        for d_id, freq, _ in self.positional_index.get(term, []):
            if d_id == doc_id:
                return freq
        return 0

    def get_doc_length(self, doc_id: str) -> int:
        return self.doc_lengths.get(doc_id, 0)

    def compute_tfidf_weights(self) -> None:
        """indexer.py:254-271 — tf*ln(N/df), L2-normalized per doc."""
        self.doc_weights = {}
        for doc_id in self.doc_lengths:
            weights: dict[str, float] = {}
            for term, plist in self.positional_index.items():
                tf = 0
                for d_id, freq, _ in plist:
                    if d_id == doc_id:
                        tf = freq
                        break
                if tf > 0:
                    df = self.doc_freqs.get(term, 0)
                    if df > 0:
                        weights[term] = tf * math.log(self.total_docs / df)
            vec_len = math.sqrt(sum(w * w for w in weights.values()))
            if vec_len > 0:
                self.doc_weights[doc_id] = {t: w / vec_len for t, w in weights.items()}
            else:
                self.doc_weights[doc_id] = weights


class OracleEngine:
    """Reference SearchEngine semantics over an OracleIndex."""

    def __init__(self, docs: list[tuple[str, str, str]]) -> None:
        """docs: list of (doc_id, text, lang) in corpus order."""
        self.idx = OracleIndex()
        self.doc_lang: dict[str, str] = {}
        for doc_id, text, lang in docs:
            tokens = process_text(text, lang)
            self.idx.add_document(doc_id, tokens)
            self.doc_lang[doc_id] = lang
        self.idx.compute_tfidf_weights()

    # -- helpers ------------------------------------------------------------
    @staticmethod
    def _top(doc_scores: dict[str, float], max_results: int, min_score: float):
        results = [(d, s) for d, s in doc_scores.items() if s >= min_score]
        results.sort(key=lambda x: (-x[1], x[0]))  # deterministic tiebreak
        return results[:max_results]

    # -- BM25 (search_engine.py:427-482) ------------------------------------
    def bm25(self, query: str, lang: str = "zh",
             max_results: int = DEFAULT_MAX_RESULTS,
             min_score: float = DEFAULT_MIN_SCORE):
        query_terms = process_text(query, lang)
        if not query_terms:
            return []
        doc_scores: dict[str, float] = {}
        n = self.idx.total_docs
        avgdl = self.idx.avg_doc_length
        for term in query_terms:
            df = self.idx.get_doc_freq(term)
            if df <= 0:  # :451-453
                continue
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1)  # :456
            for doc_id, tf, _ in self.idx.get_positional_postings(term):
                doc_len = self.idx.get_doc_length(doc_id)
                tf_norm = tf / (tf + BM25_K1 * (1 - BM25_B + BM25_B * doc_len / avgdl))  # :466
                doc_scores[doc_id] = doc_scores.get(doc_id, 0.0) + idf * tf_norm  # :469-471
        return self._top(doc_scores, max_results, min_score)

    # -- TF-IDF (search_engine.py:347-410) ----------------------------------
    def tfidf(self, query: str, lang: str = "zh",
              max_results: int = DEFAULT_MAX_RESULTS,
              min_score: float = DEFAULT_MIN_SCORE):
        query_terms = process_text(query, lang)
        if not query_terms:
            return []
        query_weights: dict[str, float] = {}
        for term in query_terms:  # :364-373
            if term not in query_weights:
                df = self.idx.get_doc_freq(term)
                if df > 0:
                    query_weights[term] = math.log(self.idx.total_docs / df)
                else:
                    query_weights[term] = 0.0
        vec_len = math.sqrt(sum(w * w for w in query_weights.values()))  # :376
        if vec_len > 0:
            query_weights = {t: w / vec_len for t, w in query_weights.items()}
        doc_scores: dict[str, float] = {}
        for term in query_terms:  # :383-399 (duplicate query terms accumulate twice)
            if term in self.idx.positional_index:
                w_qt = query_weights.get(term, 0.0)
                if w_qt <= 0:
                    continue
                for doc_id, tf, _ in self.idx.get_positional_postings(term):
                    w_dt = self.idx.doc_weights.get(doc_id, {}).get(term, 0.0)
                    doc_scores[doc_id] = doc_scores.get(doc_id, 0.0) + w_qt * w_dt
        return self._top(doc_scores, max_results, min_score)

    # -- Boolean (search_engine.py:229-345) ---------------------------------
    @staticmethod
    def parse_boolean_query(query: str):
        """search_engine.py:309-345."""
        import re

        query = query.upper()
        parts = re.split(r"\s+(AND|OR|NOT)\s+", query)
        tokens: list[str] = []
        operators: list[str] = []
        for i, part in enumerate(parts):
            if i % 2 == 0:
                tokens.append(part.lower())
            else:
                operators.append(part)
        if not operators and len(tokens) > 1:
            operators = ["AND"] * (len(tokens) - 1)
        return tokens, operators

    def boolean(self, query: str, lang: str = "zh",
                max_results: int = DEFAULT_MAX_RESULTS,
                min_score: float = DEFAULT_MIN_SCORE):
        tokens, operators = self.parse_boolean_query(query)
        if not tokens:
            return []
        if len(tokens) == 1:  # :248-269
            processed = process_text(tokens[0], lang)
            if not processed:
                return []
            term = processed[0]
            results = []
            for doc_id in self.idx.get_postings(term):
                score = self.idx.get_term_freq(term, doc_id) / self.idx.get_doc_length(doc_id)
                if score >= min_score:
                    results.append((doc_id, score))
            results.sort(key=lambda x: (-x[1], x[0]))
            return results[:max_results]
        # multi-term (:272-307)
        result_sets = []
        for raw in tokens:
            processed = process_text(raw, lang)
            if not processed:
                continue
            result_sets.append(set(self.idx.get_postings(processed[0])))
        if not result_sets:
            return []
        final = result_sets[0]
        for i, op in enumerate(operators):
            if i + 1 < len(result_sets):
                if op == "AND":
                    final = final & result_sets[i + 1]
                elif op == "OR":
                    final = final | result_sets[i + 1]
                elif op == "NOT":
                    final = final - result_sets[i + 1]
        results = []
        for doc_id in final:
            # :299 — NOTE reference scores with the RAW lowercased parts,
            # not the processed terms.
            matched = len([t for t in tokens if doc_id in self.idx.get_postings(t)])
            score = matched / len(tokens)
            if score >= min_score:
                results.append((doc_id, score))
        results.sort(key=lambda x: (-x[1], x[0]))
        return results[:max_results]

    # -- Phrase / NEAR (boolean_model.py:313-419) ---------------------------
    def phrase(self, phrase_terms: list[str]) -> set[str]:
        """boolean_model.py:363-419 — consecutive positions."""
        if not phrase_terms:
            return set()
        docs = set(self.idx.doc_lengths.keys())
        for term in phrase_terms:
            docs &= set(self.idx.get_postings(term))
        result = set()
        for doc_id in docs:
            positions = []
            ok = True
            for term in phrase_terms:
                pos = next(
                    (p for d, _, p in self.idx.get_positional_postings(term) if d == doc_id),
                    None,
                )
                if not pos:
                    ok = False
                    break
                positions.append(set(pos))
            if not ok:
                continue
            for p1 in sorted(positions[0]):
                if all((p1 + k) in positions[k] for k in range(1, len(phrase_terms))):
                    result.add(doc_id)
                    break
        return result

    def boolean_rpn(self, query: str) -> set[str]:
        """B3-B5 full boolean language over the oracle index.

        Parsing follows boolean_model.py:62-189 exactly (shared lexer /
        shunting-yard from operators.boolean_rpn).  Evaluation follows
        :259-361 with one documented fix: the reference's NEAR branch
        (:339-343) indexes its positional map with ``term_string in
        set_of_doc_ids`` — a type confusion that returns empty for every
        query — so NEAR here uses the intended position-distance
        semantics (identical to :346-349 / our ``near``) when both
        operands are bare terms, else set intersection.
        """
        from document_retrieval_system_spark.operators.boolean_rpn import (
            TokenType,
            to_rpn,
            tokenize_query,
        )

        rpn = to_rpn(tokenize_query(query))
        if not rpn:
            return set()
        all_docs = set(self.idx.doc_lengths.keys())
        stack: list[set[str]] = []
        term_of: dict[int, str] = {}

        def push(s: set[str], term: str | None = None) -> None:
            stack.append(s)
            if term is not None:
                term_of[id(s)] = term

        for token in rpn:
            if token.type == TokenType.TERM:
                push(set(self.idx.get_postings(token.value)), token.value)
            elif token.type == TokenType.PHRASE:
                push(self.phrase(token.value.lower().split()))
            elif token.type == TokenType.AND:
                if len(stack) < 2:
                    return set()
                right, left = stack.pop(), stack.pop()
                push(left & right)
            elif token.type == TokenType.OR:
                if len(stack) < 2:
                    return set()
                right, left = stack.pop(), stack.pop()
                push(left | right)
            elif token.type == TokenType.NOT:
                if len(stack) < 1:
                    return set()
                push(all_docs - stack.pop())
            elif token.type == TokenType.NEAR:
                if len(stack) < 2:
                    return set()
                try:
                    distance = int(token.value.split("/")[1])
                except (IndexError, ValueError):
                    distance = 5
                right, left = stack.pop(), stack.pop()
                lt, rt = term_of.get(id(left)), term_of.get(id(right))
                if lt is not None and rt is not None:
                    push(self.near(lt, rt, distance))
                else:
                    push(left & right)
        return stack[0] if len(stack) == 1 else set()

    def near(self, term_a: str, term_b: str, distance: int = 5) -> set[str]:
        """boolean_model.py:313-354 — |pos_a - pos_b| <= k."""
        docs_a = set(self.idx.get_postings(term_a))
        docs_b = set(self.idx.get_postings(term_b))
        result = set()
        for doc_id in docs_a & docs_b:
            pos_a = next(p for d, _, p in self.idx.get_positional_postings(term_a) if d == doc_id)
            pos_b = next(p for d, _, p in self.idx.get_positional_postings(term_b) if d == doc_id)
            if any(abs(p1 - p2) <= distance for p1 in pos_a for p2 in pos_b):
                result.add(doc_id)
        return result
