"""LaTeX extraction tier — rendered-text blocks for the arXiv shape.

Scientific corpora carry LaTeX at arXiv scale (~2M papers of ``.tex``
source). Through the plain-text fallback those payloads would extract
with their markup VERBATIM — ``\\section{..}``, ``\\cite{..}``, inline
math — the same boilerplate-in-content failure the Markdown and HTML
tiers exist to prevent. This tier extracts what a reader DISPLAYS,
under the same text model as the other reflowable tiers
(:mod:`.mdtext`, :mod:`.htmltext`): source soft-wraps are whitespace,
``\\\\`` is the one hard break, and every structural block (section
heading, paragraph, list item, caption, verbatim block) becomes one
detection-shaped block in document order.

Dispatch: LaTeX has no magic bytes, so this is a REFINEMENT of the
probe's plain-text tier, promoted only on an unambiguous structural
sniff (:func:`sniff_latex`): a ``\\documentclass`` line, or a
``\\begin{document}``/``\\end{document}`` pair. Prose that merely
mentions a backslash command stays in the txt tier (false negatives
preferred — the txt tier's literal text is a superset, never garbage).

Deterministic SUBSET, documented here:

* comments strip (unescaped ``%`` to end of line);
* only the ``document`` body renders; ``\\title{..}`` is recovered
  from the preamble as the leading block (it is content);
* sectioning (``part/chapter/section/subsection/subsubsection/
  paragraph/subparagraph``, starred or not) → its argument as one
  block; ``\\maketitle`` and other bare commands emit nothing;
* environments: ``itemize``/``enumerate``/``description`` render one
  block per ``\\item``; ``figure``/``table`` (+ starred) keep ONLY
  their ``\\caption{..}`` text; math environments (``equation``,
  ``align``, ``gather``, ``multline``, ``eqnarray``, ``displaymath``,
  + starred) and ``tabular``/``thebibliography`` drop whole;
  ``verbatim`` is one block, content VERBATIM; any other
  ``\\begin{..}``/``\\end{..}`` line pair is transparent (contents
  render normally);
* inline: ``$..$`` / ``$$..$$`` / ``\\(..\\)`` / ``\\[..\\]`` math
  spans drop; ``\\url{u}`` → u, ``\\href{u}{t}`` → t;
  reference/citation/layout commands
  (:data:`_DROP_WITH_ARG`) drop WITH their arguments; every other
  command token drops and its brace group flows through as text
  (``\\emph{x}`` → x — the unwrap default, so unknown text-wrapping
  macros never lose content); accent macros (``\\'e`` → é, ``\\"o``
  → ö, ``\\c{c}`` → ç, ...) compose; ``~`` and spacing macros are
  spaces; ``\\%`` and friends unescape; braces vanish.

The reference has no LaTeX path; this tier exists for the same 100 TB
reason the Markdown tier does — string work through the identical
probe/bucket/assembly plan.
"""

from __future__ import annotations

import re

from .plaintext import TextParagraph

__all__ = ["sniff_latex", "latex_blocks", "encode_latex"]

_DOCCLASS_RE = re.compile(r"^[ \t]*\\documentclass\b")
_BEGIN_RE = re.compile(r"\\begin\{([A-Za-z*]+)\}")
_END_RE = re.compile(r"\\end\{([A-Za-z*]+)\}")
_SECTION_RE = re.compile(
    r"^[ \t]*\\(part|chapter|section|subsection|subsubsection|"
    r"paragraph|subparagraph)\*?\s*")
_ITEM_RE = re.compile(r"\\item\b(?:\[[^\]]*\])?")
_CAPTION_RE = re.compile(r"\\caption\s*")

#: commands whose ARGUMENT is dropped along with the command —
#: references, labels, graphics, layout and preamble machinery
_DROP_WITH_ARG = frozenset((
    "cite", "citep", "citet", "citealp", "citeauthor", "citeyear",
    "ref", "eqref", "pageref", "autoref", "cref", "Cref", "label",
    "includegraphics", "input", "include", "bibliography",
    "bibliographystyle", "usepackage", "documentclass", "vspace",
    "hspace", "setlength", "newcommand", "renewcommand",
    "providecommand", "pagestyle", "thispagestyle", "color",
    "textcolor", "hypersetup", "graphicspath",
    # inline \begin{env}/\end{env} (not at line start, so outside the
    # block-level environment walk): the env NAME must not leak as text
    "begin", "end",
))

#: math environments (contents drop whole)
_MATH_ENVS = frozenset((
    "equation", "align", "gather", "multline", "eqnarray",
    "displaymath", "math", "alignat", "flalign",
))
_DROP_ENVS = frozenset(("tabular", "thebibliography", "tikzpicture"))
_LIST_ENVS = frozenset(("itemize", "enumerate", "description"))
_CAPTION_ENVS = frozenset(("figure", "table", "wrapfigure"))

#: symbol macros -> replacement text
_SYMBOLS = {
    "ldots": "...", "dots": "...", "dotsc": "...",
    "LaTeX": "LaTeX", "TeX": "TeX", "&": "&", "%": "%", "$": "$",
    "#": "#", "_": "_", "{": "{", "}": "}",
    ",": " ", ";": " ", " ": " ", "quad": " ", "qquad": " ",
}

#: accent macro + base letter -> composed character (the bibliography/
#: author-name set; unknown combinations keep the base letter)
_ACCENTS = {
    ("'", "a"): "á", ("'", "e"): "é", ("'", "i"): "í", ("'", "o"): "ó",
    ("'", "u"): "ú", ("'", "y"): "ý", ("'", "c"): "ć", ("'", "n"): "ń",
    ("`", "a"): "à", ("`", "e"): "è", ("`", "i"): "ì", ("`", "o"): "ò",
    ("`", "u"): "ù",
    ('"', "a"): "ä", ('"', "e"): "ë", ('"', "i"): "ï", ('"', "o"): "ö",
    ('"', "u"): "ü",
    ("^", "a"): "â", ("^", "e"): "ê", ("^", "i"): "î", ("^", "o"): "ô",
    ("^", "u"): "û",
    ("~", "a"): "ã", ("~", "n"): "ñ", ("~", "o"): "õ",
    ("c", "c"): "ç", ("v", "s"): "š", ("v", "c"): "č", ("v", "z"): "ž",
    ("o", ""): "ø", ("ss", ""): "ß", ("ae", ""): "æ", ("oe", ""): "œ",
}
for (_m, _b), _ch in list(_ACCENTS.items()):
    if _b:
        _ACCENTS[(_m, _b.upper())] = _ch.upper()


def _strip_comments(line: str) -> str:
    """Truncate at the first unescaped ``%``."""
    i = 0
    while True:
        i = line.find("%", i)
        if i < 0:
            return line
        back = i - 1
        n = 0
        while back >= 0 and line[back] == "\\":
            n += 1
            back -= 1
        if n % 2 == 0:
            return line[:i]
        i += 1


def _brace_group(s: str, i: int) -> tuple[str, int]:
    """``s[i] == '{'`` -> (content, index past the matching brace).
    Unbalanced groups close at end of string."""
    depth = 0
    j = i
    while j < len(s):
        if s[j] == "\\":
            j += 2
            continue
        if s[j] == "{":
            depth += 1
        elif s[j] == "}":
            depth -= 1
            if depth == 0:
                return s[i + 1:j], j + 1
        j += 1
    return s[i + 1:], len(s)


def _skip_groups(s: str, i: int) -> int:
    """Skip any run of ``[..]`` / ``{..}`` argument groups following a
    command (whitespace between groups skips, but whitespace after the
    LAST group stays — it separates the following word)."""
    while i < len(s):
        k = i
        while k < len(s) and s[k] in " \t":
            k += 1
        if k < len(s) and s[k] == "[":
            j = s.find("]", k)
            i = len(s) if j < 0 else j + 1
        elif k < len(s) and s[k] == "{":
            _, i = _brace_group(s, k)
        else:
            return i
    return i


def _render(s: str, depth: int = 0) -> str:
    r"""One paragraph's source -> displayed text (inline rules).
    ``depth`` caps nested argument re-rendering (\href/\footnote):
    adversarially deep nesting degrades to dropped content instead of
    a RecursionError escaping the quarantine contract."""
    if depth > 32:
        return ""
    out: list[str] = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "%":  # comments already stripped; defensive
            i = n
        elif c == "$":
            # $..$ / $$..$$ math drops
            dbl = i + 1 < n and s[i + 1] == "$"
            close = "$$" if dbl else "$"
            j = s.find(close, i + len(close))
            i = n if j < 0 else j + len(close)
        elif c == "~":
            # the tie renders as a NON-BREAKING space so interior
            # space runs survive _clean's collapse (authentic LaTeX:
            # ~ is exactly U+00A0); _clean folds it to a plain space
            out.append("\u00a0")
            i += 1
        elif c in "{}":
            i += 1
        elif c == "\\":
            if i + 1 >= n:
                break
            nxt = s[i + 1]
            if nxt == "\\":
                out.append("\n")  # the one hard break
                i += 2
                if i < n and s[i] == "[":  # \\[2ex] spacing arg
                    j = s.find("]", i)
                    i = n if j < 0 else j + 1
            elif nxt == "(":
                j = s.find("\\)", i + 2)
                i = n if j < 0 else j + 2
            elif nxt == "[":
                j = s.find("\\]", i + 2)
                i = n if j < 0 else j + 2
            elif not nxt.isalpha():
                # escape / symbol / accent single-char macro
                if nxt in "'`\"^~":
                    # accent: \"o or \"{o}
                    k = i + 2
                    if k < n and s[k] == "{":
                        base, k = _brace_group(s, k)
                    elif k < n:
                        base, k = s[k], k + 1
                    else:
                        base = ""
                    out.append(_ACCENTS.get((nxt, base), base))
                    i = k
                else:
                    out.append(_SYMBOLS.get(nxt, nxt))
                    i += 2
            else:
                j = i + 1
                while j < n and s[j].isalpha():
                    j += 1
                name = s[i + 1:j]
                star = j < n and s[j] == "*"
                if star:
                    j += 1
                if name in ("c", "v", "o", "ss", "ae", "oe"):
                    # letter-named accent/symbol macros: \c{c}, \ss
                    k = j
                    while k < n and s[k] in " \t":
                        k += 1
                    if name in ("c", "v") and k < n and s[k] == "{":
                        base, k = _brace_group(s, k)
                        out.append(_ACCENTS.get((name, base), base))
                        i = k
                    else:
                        out.append(_ACCENTS.get((name, ""), ""))
                        i = k if k > j else j
                elif name == "url":
                    k = _skip_ws(s, j)
                    if k < n and s[k] == "{":
                        u, k = _brace_group(s, k)
                        out.append(u)
                    i = k
                elif name == "href":
                    k = _skip_ws(s, j)
                    if k < n and s[k] == "{":
                        _u, k = _brace_group(s, k)
                    k = _skip_ws(s, k)
                    if k < n and s[k] == "{":
                        t, k = _brace_group(s, k)
                        out.append(_render(t, depth + 1))
                    i = k
                elif name == "footnote":
                    # parenthetical content: keep it, space-separated
                    # (plain unwrap would glue it to the anchor word)
                    k = _skip_ws(s, j)
                    if k < n and s[k] == "{":
                        t, k = _brace_group(s, k)
                        out.append(" " + _render(t, depth + 1).strip())
                    i = k
                elif name in _DROP_WITH_ARG:
                    i = _skip_groups(s, j)
                elif name in _SYMBOLS:
                    out.append(_SYMBOLS[name])
                    i = j
                else:
                    # unknown command: the token drops, a following
                    # optional [..] drops, brace args flow through as
                    # text (the unwrap default — never lose content)
                    k = _skip_ws(s, j)
                    if k < n and s[k] == "[":
                        m = s.find("]", k)
                        k = n if m < 0 else m + 1
                        i = k
                    else:
                        i = j
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _skip_ws(s: str, i: int) -> int:
    while i < len(s) and s[i] in " \t":
        i += 1
    return i


def _clean(rendered: str) -> str:
    """Collapse whitespace per displayed line (LaTeX renders any run
    of spaces as one; ties survive as U+00A0 and fold to plain spaces
    AFTER the collapse), keep hard breaks."""
    lines = [re.sub(r"[ \t]+", " ", ln).strip().replace("\u00a0", " ")
             for ln in rendered.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def sniff_latex(text: str) -> bool:
    """Unambiguous structural sniff over VALIDATED plain text: a
    ``\\documentclass`` line, or a ``\\begin{document}`` /
    ``\\end{document}`` pair."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    for line in norm.split("\n"):
        if _DOCCLASS_RE.match(_strip_comments(line)):
            return True
    return "\\begin{document}" in norm and "\\end{document}" in norm


def latex_blocks(text: str, base: int = 0) -> list[TextParagraph]:
    """LaTeX source -> displayed-text blocks in document order.
    Positions are monotone source ordinals (all the downstream
    ``(page, y1, x1)`` span sort needs)."""
    norm = text.replace("\r\n", "\n").replace("\r", "\n")
    lines = [_strip_comments(ln) for ln in norm.split("\n")]
    out: list[TextParagraph] = []
    pos = base

    def emit(body: str) -> None:
        nonlocal pos
        if body:
            out.append(TextParagraph(pos, body))
            pos += 1

    # preamble title is content: recover it as the leading block
    src = "\n".join(lines)
    begin = src.find("\\begin{document}")
    if begin >= 0:
        pre = src[:begin]
        m = re.search(r"\\title\s*(\{)", pre)
        if m:
            title, _ = _brace_group(pre, m.start(1))
            emit(_clean(_render(" ".join(title.split("\n")))))
        end = src.find("\\end{document}", begin)
        body = src[begin + len("\\begin{document}"):
                   end if end >= 0 else len(src)]
    else:
        body = src

    para: list[str] = []

    def flush() -> None:
        # source soft-wraps are whitespace (the shared text model);
        # only \\ produces a hard break inside a block
        if para:
            emit(_clean(_render(" ".join(para))))
            para.clear()

    body_lines = body.split("\n")
    i = 0
    env_stack: list[str] = []
    while i < len(body_lines):
        line = body_lines[i]
        stripped = line.strip()
        mb = _BEGIN_RE.search(stripped)
        if mb and stripped.startswith("\\begin{"):
            env = mb.group(1).rstrip("*")
            if env == "verbatim":
                flush()
                j = i + 1
                verb: list[str] = []
                while j < len(body_lines) and "\\end{verbatim}" not in \
                        body_lines[j]:
                    verb.append(body_lines[j])
                    j += 1
                emit("\n".join(verb))
                i = j + 1
                continue
            if env in _MATH_ENVS or env in _DROP_ENVS:
                flush()
                j = i
                depth = 0
                while j < len(body_lines):
                    depth += len(_BEGIN_RE.findall(body_lines[j]))
                    depth -= len(_END_RE.findall(body_lines[j]))
                    if depth <= 0:
                        break
                    j += 1
                i = j + 1
                continue
            if env in _CAPTION_ENVS:
                flush()
                j = i
                depth = 0
                inner: list[str] = []
                while j < len(body_lines):
                    depth += len(_BEGIN_RE.findall(body_lines[j]))
                    depth -= len(_END_RE.findall(body_lines[j]))
                    inner.append(body_lines[j])
                    if depth <= 0:
                        break
                    j += 1
                blob = "\n".join(inner)
                m = _CAPTION_RE.search(blob)
                if m:
                    k = _skip_ws(blob, m.end())
                    if k < len(blob) and blob[k] == "{":
                        cap, _ = _brace_group(blob, k)
                        emit(_clean(_render(" ".join(cap.split("\n")))))
                i = j + 1
                continue
            if env in _LIST_ENVS:
                flush()
                env_stack.append(env)
                i += 1
                continue
            # transparent environment: drop the begin line only
            rest = stripped[mb.end():].strip()
            if rest:
                para.append(rest)
            i += 1
            continue
        me = _END_RE.search(stripped)
        if me and stripped.startswith("\\end{") \
                and env_stack and me.group(1).rstrip("*") == env_stack[-1]:
            flush()
            env_stack.pop()
            i += 1
            continue
        if me and stripped.startswith("\\end{"):
            i += 1
            continue
        if env_stack and _ITEM_RE.search(line):
            # text before the first \item continues the previous block
            parts = _ITEM_RE.split(line)
            if parts[0].strip():
                para.append(parts[0])
            flush()
            # one block per \item, multiple items on one line split
            for part in parts[1:]:
                flush()
                para.append(part)
            i += 1
            continue
        ms = _SECTION_RE.match(line)
        if ms:
            flush()
            k = _skip_ws(line, ms.end())
            if k < len(line) and line[k] == "{":
                head, k2 = _brace_group(line, k)
                emit(_clean(_render(head)))
                tail = line[k2:].strip()
                if tail:
                    para.append(tail)
            i += 1
            continue
        if not stripped:
            flush()
            i += 1
            continue
        para.append(line)
        i += 1
    flush()
    return out


# ---------------------------------------------------------------------------
# test/fixture encoder (the tier round-trip contract)
# ---------------------------------------------------------------------------

def encode_latex(blocks: list[str]) -> bytes:
    """Plain-text blocks -> deterministic ``.tex`` source whose
    :func:`latex_blocks` extraction equals the input (markup added
    round-trips to nothing): first block becomes the ``\\title``,
    every 4th block a ``\\section``, the rest paragraphs with inline
    ``\\emph``/math/``\\cite`` noise the renderer must strip."""
    lines = ["\\documentclass{article}",
             "\\usepackage{amsmath}  % preamble machinery",
             ]
    body: list[str] = []
    for i, b in enumerate(blocks):
        one = b.replace("\n", " \\\\ ")
        # interior space runs become ties (one rendered space each)
        one = re.sub(" {2,}", lambda m: "~" * len(m.group()), one)
        if i == 0:
            lines.append("\\title{%s}" % one)
            continue
        if i % 4 == 0:
            body.append("\\section{%s} %% trailing comment" % one)
        else:
            words = one.split(" ")
            if len(words) > 2:
                words[0] = "\\emph{%s}" % words[0]
                words.append("\\cite{key%d} $x_%d$" % (i, i))
            body.append(" ".join(words))
        body.append("")
    return ("\n".join(lines)
            + "\n\\begin{document}\n\\maketitle\n"
            + "\n".join(body)
            + "\n\\end{document}\n").encode("utf-8")
