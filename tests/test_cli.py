"""The drop-in CLI: reference driver contract (3 args, reference output)."""

from __future__ import annotations

import glob

from similarity_search_with_hadoop_mapreduce_spark.__main__ import main
from tests.reference_sim import mr_similarity
from tests.test_parity import TOY


def _write_corpus(d, corpus):
    for doc_id, text in corpus.items():
        (d / f"{doc_id}.txt").write_text(text)


def test_cli_arity_mismatch_exits_1(spark):
    assert main([]) == 1
    assert main(["a", "b"]) == 1
    assert main(["a", "b", "c", "d"]) == 1


def test_cli_end_to_end_matches_reference_lines(spark, tmp_path):
    corpus_dir = tmp_path / "corpus"
    corpus_dir.mkdir()
    _write_corpus(corpus_dir, TOY)
    out = tmp_path / "out"
    rc = main(
        [str(corpus_dir), str(out), str(corpus_dir / "q.txt")], spark=spark
    )
    assert rc == 0
    lines = []
    for f in glob.glob(f"{out}/part-*"):
        with open(f) as fh:
            lines.extend(line.rstrip("\n") for line in fh)
    want = sorted(
        f"{doc} - q\t{score!r}" for doc, score in mr_similarity(TOY, "q").items()
    )
    assert sorted(lines) == want
