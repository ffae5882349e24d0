"""HTML -> Markdown conversion over the minihtml span DOM — the
extraction step an LLM-pretraining pipeline runs after main-content
isolation (html2text/markdownify class of tools, reimplemented on
the engine's own tolerant parser): structure that matters for
training (headings, emphasis, links, lists, code blocks) is kept as
markdown, tag noise is dropped, script/style subtrees are removed
entirely.

Contract notes:

* block elements (h1-h6, p, ul/ol, pre) emit blocks separated by
  one blank line; inline elements (a, b/strong, i/em, code, br)
  render inside their block;
* UNKNOWN tags unwrap (children render in place) — the tolerant
  default for real-world markup;
* text nodes are emitted RAW (no entity decoding), matching
  minihtml's byte-exact extraction contract — quirk layers own
  entity handling, as in the extract families;
* the reference analogue is the field-extraction layer
  (`tochigi.py:25`-style selector pulls); this is the same parse
  applied to whole-document reshaping for corpus text.
"""

from __future__ import annotations

from . import minihtml

_SKIP = {"script", "style", "head"}
_HEADINGS = {f"h{i}": i for i in range(1, 7)}


def _child_end(node: minihtml.Node, child: minihtml.Node) -> int:
    """Source position just past `child` (its explicit end tag if one
    follows its inner span, else the implied-close point)."""
    src = child._src
    endtag = f"</{child.tag}>"
    if src[child.inner_end : child.inner_end + len(endtag)] == endtag:
        return child.inner_end + len(endtag)
    return child.inner_end


def _inline(node: minihtml.Node) -> str:
    """Render children + interleaved text of `node` as inline md."""
    src = node._src
    out: list[str] = []
    cursor = node.inner_start
    for child in node.children:
        out.append(src[cursor : child.start])
        out.append(_render_inline_el(child))
        cursor = _child_end(node, child)
    out.append(src[cursor : node.inner_end])
    return "".join(out)


def _render_inline_el(el: minihtml.Node) -> str:
    t = el.tag
    if t in _SKIP:
        return ""
    if t == "a":
        return f"[{_inline(el)}]({el.get('href') or ''})"
    if t in ("b", "strong"):
        return f"**{_inline(el)}**"
    if t in ("i", "em"):
        return f"*{_inline(el)}*"
    if t == "code":
        return f"`{_inline(el)}`"
    if t == "br":
        return "\n"
    return _inline(el)  # unknown inline: unwrap


def _blocks(node: minihtml.Node, out: list[str]) -> None:
    for el in node.children:
        t = el.tag
        if t in _SKIP:
            continue
        if t in _HEADINGS:
            out.append("#" * _HEADINGS[t] + " " + _inline(el).strip())
        elif t == "p":
            out.append(_inline(el).strip())
        elif t in ("ul", "ol"):
            items = []
            for i, li in enumerate(el.find_all("li")):
                marker = "- " if t == "ul" else f"{i + 1}. "
                items.append(marker + _inline(li).strip())
            out.append("\n".join(items))
        elif t == "pre":
            out.append("```\n" + el.inner_html() + "\n```")
        else:
            _blocks(el, out)  # html/body/div wrappers: descend


def to_markdown(html: str) -> str:
    root = minihtml.parse(html)
    out: list[str] = []
    _blocks(root, out)
    return "\n\n".join(b for b in out if b)
