"""HTML main-content extraction via DOM text-density heuristics.

The north-star pipeline strips HTML boilerplate with block-level
text-density scoring (the boilerpipe / Arc90-readability family:
Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010). This is a from-scratch stdlib implementation —
no external parser:

1. Parse with ``html.parser.HTMLParser`` into BLOCKS: a new block opens
   at each block-level element (p, div, li, td, h1-h6, article,
   section, main, blockquote, pre); text inside ``<a>`` is counted as
   link text; ``script/style/noscript/template`` content is dropped;
   text inside ``nav/header/footer/aside`` is tagged boilerplate
   context.
2. Score each block: ``link_density = link_chars / text_chars``.
3. Keep blocks with ``text_chars ≥ MIN_BLOCK_CHARS`` and
   ``link_density < MAX_LINK_DENSITY`` that are not inside boilerplate
   containers; join kept blocks with "\\n\\n".

Deterministic, pure-Python, vectorization-irrelevant (parsing is
inherently per-document) — runs inside the extraction actor pool.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "td", "th", "h1", "h2", "h3", "h4", "h5", "h6",
        "article", "section", "main", "blockquote", "pre", "tr", "table",
        "ul", "ol", "body",
    }
)
BOILERPLATE_TAGS = frozenset({"nav", "header", "footer", "aside"})
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "head", "title"})

MIN_BLOCK_CHARS = 25
MAX_LINK_DENSITY = 0.33


@dataclass
class Block:
    texts: list[str] = field(default_factory=list)
    link_chars: int = 0
    in_boilerplate: bool = False

    @property
    def text(self) -> str:
        return "".join(self.texts)

    @property
    def text_chars(self) -> int:
        return len(self.text.strip())

    @property
    def link_density(self) -> float:
        n = self.text_chars
        return self.link_chars / n if n else 1.0

    def is_content(self) -> bool:
        return (
            not self.in_boilerplate
            and self.text_chars >= MIN_BLOCK_CHARS
            and self.link_density < MAX_LINK_DENSITY
        )


class _DensityParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._current = Block()
        self._skip_depth = 0
        self._boiler_depth = 0
        self._link_depth = 0

    def _flush(self):
        if self._current.texts:
            self.blocks.append(self._current)
        self._current = Block(in_boilerplate=self._boiler_depth > 0)

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self._skip_depth += 1
        elif tag in BOILERPLATE_TAGS:
            self._flush()
            self._boiler_depth += 1
            self._current.in_boilerplate = True
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth += 1
        elif tag == "br":
            self._current.texts.append("\n")

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self._skip_depth = max(0, self._skip_depth - 1)
        elif tag in BOILERPLATE_TAGS:
            self._flush()
            self._boiler_depth = max(0, self._boiler_depth - 1)
            self._current.in_boilerplate = self._boiler_depth > 0
        elif tag in BLOCK_TAGS:
            self._flush()
        elif tag == "a":
            self._link_depth = max(0, self._link_depth - 1)

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self._current.texts.append(data)
        if self._link_depth:
            self._current.link_chars += len(data.strip())

    def close(self):
        super().close()
        self._flush()


def extract_blocks(html_text: str) -> list[Block]:
    parser = _DensityParser()
    parser.feed(html_text)
    parser.close()
    return [b for b in parser.blocks if b.text_chars > 0]


def extract_main_content(html_text: str) -> str:
    """Main content = density-kept blocks joined by blank lines."""
    kept = [b.text.strip() for b in extract_blocks(html_text) if b.is_content()]
    return "\n\n".join(kept)


def block_stats(html_text: str) -> tuple[int, int]:
    """(n_content_blocks, n_boilerplate_blocks) — for metrics columns."""
    blocks = extract_blocks(html_text)
    kept = sum(1 for b in blocks if b.is_content())
    return kept, len(blocks) - kept


def wrap_boilerplate(text: str, key: str) -> str:
    """Deterministic synthetic page: nav/header/footer/aside boilerplate
    around ONE main paragraph containing ``text`` verbatim — so
    ``extract_main_content(wrap_boilerplate(t, k)) == t.strip()`` and
    the recovery property is oracle-checkable in SQL."""
    import hashlib

    h = hashlib.md5(key.encode()).hexdigest()
    links = "".join(
        f'<a href="/{h[i:i+4]}">{h[i:i+4]}</a> ' for i in range(0, 16, 4)
    )
    return (
        "<html><head><title>synth</title><style>p{margin:0}</style></head>"
        f"<body><header><h1>s{h[:6]}</h1><nav>{links}</nav></header>"
        f'<div id="main"><p>{text}</p></div>'
        f"<aside>{links}</aside>"
        f"<footer><p>{links}</p></footer></body></html>"
    )
