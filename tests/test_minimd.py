"""functions/minimd — HTML->Markdown conversion contracts."""

from __future__ import annotations

from goto_eater_crawler_spark.functions import minimd


def md(html: str) -> str:
    return minimd.to_markdown(html)


def test_headings_all_levels():
    assert md("<h1>a</h1><h3>b</h3><h6>c</h6>") == "# a\n\n### b\n\n###### c"


def test_inline_nesting():
    got = md('<p>x <b>bo <i>it</i></b> <a href="/u"><b>lk</b></a></p>')
    assert got == "x **bo *it*** [**lk**](/u)"


def test_script_and_style_dropped_entirely():
    got = md(
        "<head><style>p{}</style></head><body>"
        "<script>var a='<p>no</p>';</script><p>yes</p></body>"
    )
    assert got == "yes"


def test_unknown_tags_unwrap():
    assert md('<div><section><p>t <span>s</span></p></section></div>') \
        == "t s"


def test_ordered_list_markers():
    assert md("<ol><li>a</li><li>b</li></ol>") == "1. a\n2. b"


def test_pre_block_keeps_raw_inner():
    assert md("<pre>a &amp; <b>raw</b></pre>") \
        == "```\na &amp; <b>raw</b>\n```"


def test_hostile_markup_still_converts():
    # attribute reorder, unquoted attr, unclosed <li>, stray end tag
    got = md(
        "<p >t</p></b><ul><li>a<li>b</ul>"
        "<a class=x href=/q>q</a>"
    )
    assert "- a" in got and "- b" in got and "t" in got


def test_br_becomes_newline():
    assert md("<p>a<br>b</p>") == "a\nb"


def test_raw_text_no_entity_decoding():
    assert md("<p>&lt;kept&gt;</p>") == "&lt;kept&gt;"
