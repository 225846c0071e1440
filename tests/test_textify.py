"""A-8 textify: the frozen byte-identity spec."""

from readembedability_spark.extractor.dom import parse_html
from readembedability_spark.extractor.textify import textify


def t(html: str) -> str:
    return textify(parse_html(html))


def test_blocks_join_with_blank_line():
    assert t("<p>one</p><p>two</p>") == "one\n\ntwo"


def test_br_is_hard_newline():
    assert t("<p>line1<br>line2</p>") == "line1\nline2"


def test_li_prefix():
    assert t("<ul><li>a</li><li>b</li></ul>") == "- a\n\n- b"


def test_whitespace_collapse():
    assert t("<p>  a \t\n  b  c  </p>") == "a b c"


def test_zero_width_removed():
    assert t("<p>a​b﻿c</p>") == "abc"


def test_script_style_skipped():
    assert t("<p>x</p><script>var y=1;</script><style>.a{}</style>") == "x"


def test_nested_blocks():
    assert (
        t("<div><h2>Head</h2><div><p>inner</p></div>tail</div>")
        == "Head\n\ninner\n\ntail"
    )


def test_inline_elements_do_not_break():
    assert t("<p>a <em>b</em> <strong>c</strong> d</p>") == "a b c d"


def test_nfc_normalization():
    # e + combining acute → é (NFC)
    assert t("<p>café</p>") == "café"


def test_empty_blocks_dropped():
    assert t("<p></p><p>  </p><p>x</p><div></div>") == "x"


def test_consecutive_br_no_empty_lines():
    assert t("<p>a<br><br>b</p>") == "a\nb"


def test_table_cells_are_blocks():
    assert t("<table><tr><td>c1</td><td>c2</td></tr></table>") == "c1\n\nc2"
