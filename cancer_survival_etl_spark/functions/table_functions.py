"""Python UDTFs (Spark 4 user-defined TABLE functions): custom
row→rows operators callable from SQL as lateral table functions —
the extension point for generators the built-in explode family can't
express (stateful per-row expansion, multi-column yields).

Registration makes them part of the engine's SQL surface:

    spark.udtf.register("chunk_text", chunk_text_udtf)
    spark.sql(\"""
        SELECT d.doc_id, c.chunk_id, c.chunk_text
        FROM docs d, LATERAL chunk_text(d.text, 8) c
    \""")

Engine guidance: UDTF rows cross the JVM↔Python boundary per row —
for the hot path prefer the pure-expression forms (llm/curation.
chunk_documents is the same semantics at codegen speed). A UDTF is
the right tool when per-row logic is genuinely imperative or the
expansion schema is dynamic.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_id: bigint, chunk_text: string, n_tokens: bigint")
class chunk_text_udtf:
    """Whitespace-token chunker as a table function: yields one row per
    ``chunk_size``-token chunk. Semantics identical to
    llm/curation.chunk_documents (pinned by test)."""

    def eval(self, text: str, chunk_size: int):
        if text is None:
            return
        toks = text.split(" ")
        for i in range(0, len(toks), chunk_size):
            piece = toks[i : i + chunk_size]
            yield i // chunk_size, " ".join(piece), len(piece)


def register_table_functions(spark) -> None:
    """Register every engine UDTF on the session's SQL surface."""
    spark.udtf.register("chunk_text", chunk_text_udtf)
