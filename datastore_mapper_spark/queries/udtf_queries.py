"""Python UDTF coverage (the table-function UDF shape; complements
scalar #52, pandas #53, grouped #54, and builtin-UDTF explode #40).

The demo operator is LM-pipeline real: chunk each document into
fixed-size token windows (the context-window packing step before
tokenization).  The UDTF is registered into the SQL catalog and used
via LATERAL, so it composes like any table function.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf

from ..catalog import table
from ..registry import query

CHUNK = 8


@udtf(returnType="chunk_id INT, chunk STRING, n_tokens INT")
class ChunkTokens:
    """Emit one row per CHUNK-token window of the input text."""

    def eval(self, text: str):
        toks = text.split(" ")
        for i in range(0, (len(toks) + CHUNK - 1) // CHUNK):
            window = toks[i * CHUNK:(i + 1) * CHUNK]
            yield i, " ".join(window), len(window)


@query(
    "udtf_chunk_tokens",
    "UDF",
    oracle="""
    SELECT doc_id, CAST(g.i AS INT) AS chunk_id,
           array_to_string(toks[g.i * 8 + 1 : g.i * 8 + 8], ' ') AS chunk,
           CAST(len(toks[g.i * 8 + 1 : g.i * 8 + 8]) AS INT) AS n_tokens
    FROM (SELECT doc_id, string_split(text, ' ') AS toks
          FROM documents WHERE doc_id < 1000),
         LATERAL (SELECT unnest(generate_series(
             0, CAST(ceil(len(toks) / 8.0) AS BIGINT) - 1)) AS i) g
    """,
)
def udtf_chunk_tokens(spark, sf_dir):
    """Python UDTF via LATERAL: document → fixed 8-token chunks with
    per-chunk token counts; oracle replays the same windowing with
    list slices."""
    table(spark, sf_dir, "documents")
    spark.udtf.register("chunk_tokens", ChunkTokens)
    return spark.sql(
        """
        SELECT doc_id, c.chunk_id, c.chunk, c.n_tokens
        FROM documents, LATERAL chunk_tokens(text) AS c
        WHERE doc_id < 1000
        """
    )
