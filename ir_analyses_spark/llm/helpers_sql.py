"""Shared literals for the text-analysis operators — one definition used by
both the Spark expressions and the DuckDB oracle strings so the two sides
can never drift."""

#: English stopword alternation used by language-ID / quality scoring.
#: Word-bounded; identical regex semantics in Java (Spark) and RE2 (DuckDB).
STOPWORD_PATTERN = (
    r"\b(the|and|of|to|a|in|is|for|on|with|as|by|at|from)\b"
)
