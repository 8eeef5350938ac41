from __future__ import annotations

from arrowhouse_spark.operators.text import html_extract


def _clean(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], "html string")
    return html_extract(df).collect()[0]["clean_text"]


def test_html_extract_strips_script_style_comment_content(spark):
    got = _clean(
        spark,
        '<head><style>p{x:1}</style><script>if (a<b) { alert("hi") }'
        "</script></head><!-- secret --><p>keep me</p>",
    )
    assert got == "keep me"


def test_html_extract_tags_are_word_boundaries(spark):
    assert _clean(spark, "<p>a</p><p>b</p>") == "a b"


def test_html_extract_entity_order(spark):
    # &amp;lt; must decode to the literal text '&lt;', never to '<'
    got = _clean(spark, "<p>x &amp;lt; y &lt;tag&gt; &quot;q&quot; &#39;a&#39;&nbsp;!</p>")
    assert got == 'x &lt; y <tag> "q" \'a\' !'


def test_html_extract_multiline_blocks(spark):
    got = _clean(spark, "<script>\nvar a = 1;\nvar b = 2;\n</script>ok\n\n  done")
    assert got == "ok done"
