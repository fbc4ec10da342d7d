"""Drop-in CLI matching the reference driver's contract.

The reference's only executable surface is ``main <input dir> <output dir>
<query file>`` (``BookQuery.java:181-189``; exit 1 on arity mismatch),
which scores every document in the input directory against the query file
by trigram containment and writes ``doc - query\\tscore`` text lines
(``BookQuery.java:167``). This module is the same contract on Spark::

    python -m similarity_search_with_hadoop_mapreduce_spark \\
        /path/to/corpus_dir /path/to/output_dir /path/to/corpus_dir/query.txt

Differences from the reference, all by design:

- one lazy DataFrame DAG instead of two chained MapReduce jobs — no
  ``<output>_temp`` HDFS round trip, no leftover temp dir (SURVEY §3.1);
- the query document is identified by its basename (up to the first
  ``.``), exactly the reference's doc-id rule (``BookQuery.java:48-49``),
  rather than the hard-coded literal ``"query"`` — name the file
  ``query.*`` inside the corpus dir for byte-identical behavior;
- scores are identical (quirks Q1-Q7 reproduced in parity mode).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import SparkSession


def main(argv: list[str], spark: SparkSession | None = None) -> int:
    if len(argv) != 3:
        print(
            "usage: python -m similarity_search_with_hadoop_mapreduce_spark "
            "<input dir> <output dir> <query file>",
            file=sys.stderr,
        )
        return 1
    input_dir, output_dir, query_file = argv

    from similarity_search_with_hadoop_mapreduce_spark.operators.similarity import (
        similarity_to_query,
    )
    from similarity_search_with_hadoop_mapreduce_spark.session import get_session
    from similarity_search_with_hadoop_mapreduce_spark.sources.sinks import (
        write_reference_output,
    )
    from similarity_search_with_hadoop_mapreduce_spark.sources.tables import (
        load_corpus_dir,
    )

    # doc-id rule S6: last path segment up to the first "."
    query_doc_id = os.path.basename(query_file).split(".", 1)[0]
    spark = spark or get_session("similarity-search-cli")
    corpus = load_corpus_dir(spark, input_dir)
    scores = similarity_to_query(corpus, query_doc_id=query_doc_id)
    write_reference_output(scores, output_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
