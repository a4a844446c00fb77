"""Text-analysis operator edge cases not covered by the driver oracles."""

from doctr_spark.operators.text_analysis import char_entropy


def test_char_entropy_counts_whole_codepoints(spark, tmp_path):
    """ADVICE r4: the char split must not shear astral-plane characters
    into UTF-16 surrogate halves — U+1F4A9 is ONE symbol, so 'a(poop)(poop)b'
    has counts {a:1, poop:2, b:1} and entropy 1.5 bits (surrogate-half
    splitting would yield 4 distinct units and 2.0 bits)."""
    rows = [(1, "a\U0001f4a9\U0001f4a9b"), (2, "aaaa"), (3, "ab")]
    spark.createDataFrame(rows, "doc_id long, text string").write.mode("overwrite").parquet(
        f"{tmp_path}/documents.parquet"
    )
    got = {r.doc_id: r.entropy_bits for r in char_entropy(spark, str(tmp_path)).collect()}
    assert got == {1: 1.5, 2: 0.0, 3: 1.0}
