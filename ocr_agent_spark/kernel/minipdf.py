"""Minimal PDF writer + pdfminer-style text extractor (pure stdlib).

The container has no PDF library, so the engine carries its own small
one: a writer that emits valid single-font PDFs (used by the fixture
generator to create deterministic binary payloads) and a reader that
reconstructs page text from content streams — tokenizes ``BT..ET`` text
objects, tracks the text cursor through ``Td/TD/Tm/T*``, collects
positioned strings from ``Tj/'/TJ``, then rebuilds lines top-to-bottom,
left-to-right (the layout-reconstruction approach of pdfminer's
LTTextLine grouping, reimplemented minimally). FlateDecode streams are
supported via stdlib zlib.

Reference analogue: pdf page-count probe + per-page render,
/root/reference/src/ocr_agent/pdf_render.py:16-62 — there a GPU OCR
consumes rendered pixels; here layout reconstruction yields the text
directly and deterministically.
"""

from __future__ import annotations

import re
import zlib

_PDF_MAGIC = b"%PDF"


def is_pdf_payload(data: bytes) -> bool:
    return data[:4] == _PDF_MAGIC


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _escape_pdf_string(text: str) -> str:
    out = []
    for ch in text:
        if ch in "()\\":
            out.append("\\" + ch)
        elif ord(ch) < 32 or ord(ch) > 126:
            # Keep the writer latin-1-safe; exotic chars become octal or '?'
            code = ord(ch)
            out.append(f"\\{code:03o}" if code < 256 else "?")
        else:
            out.append(ch)
    return "".join(out)


def build_pdf_positioned(pages: list[list[tuple[float, float, str]]],
                         compress: bool = False) -> bytes:
    """Build a minimal PDF whose text chunks sit at explicit (x, y)
    positions (via ``Tm``) — the fixture writer for layout tests
    (multi-column pages, headers spanning columns)."""
    content_pages: list[list[str]] = []
    for chunks in pages:
        ops = ["BT", "/F1 12 Tf"]
        for x, y, text in chunks:
            ops.append(f"1 0 0 1 {x:g} {y:g} Tm")
            ops.append(f"({_escape_pdf_string(text)}) Tj")
        ops.append("ET")
        content_pages.append(ops)
    return _assemble_pdf(content_pages, compress)


def build_pdf(pages: list[list[str]], compress: bool = False) -> bytes:
    """Build a valid minimal PDF: one text line per list entry per page."""
    content_pages: list[list[str]] = []
    for lines in pages:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for j, line in enumerate(lines):
            if j > 0:
                ops.append("0 -14 Td")
            ops.append(f"({_escape_pdf_string(line)}) Tj")
        ops.append("ET")
        content_pages.append(ops)
    return _assemble_pdf(content_pages, compress)


def _assemble_pdf(content_pages: list[list[str]], compress: bool) -> bytes:
    """Shared writer back half: page ops → object table + xref."""
    objects: list[bytes] = []  # 1-indexed bodies, object i = objects[i-1]

    n_pages = len(content_pages)
    font_obj_num = 3 + 2 * n_pages
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode("ascii")
    )
    for i, ops in enumerate(content_pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_obj_num} 0 R >> >> "
                f"/Contents {content_num} 0 R >>"
            ).encode("ascii")
        )
        stream = "\n".join(ops).encode("latin-1")
        if compress:
            stream = zlib.compress(stream)
            head = f"<< /Length {len(stream)} /Filter /FlateDecode >>".encode("ascii")
        else:
            head = f"<< /Length {len(stream)} >>".encode("ascii")
        objects.append(head + b"\nstream\n" + stream + b"\nendstream")
    objects.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    buf = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, body in enumerate(objects, start=1):
        offsets.append(len(buf))
        buf += f"{i} 0 obj\n".encode("ascii") + body + b"\nendobj\n"
    xref_pos = len(buf)
    buf += f"xref\n0 {len(objects) + 1}\n".encode("ascii")
    buf += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        buf += f"{off:010d} 00000 n \n".encode("ascii")
    buf += (
        f"trailer\n<< /Size {len(objects) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_pos}\n%%EOF\n"
    ).encode("ascii")
    return bytes(buf)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

_KIDS_RE = re.compile(rb"/Kids\s*\[(.*?)\]", re.DOTALL)
_REF_RE = re.compile(rb"(\d+)\s+0\s+R")
_CONTENTS_RE = re.compile(rb"/Contents\s*(\[[^\]]*\]|\d+\s+0\s+R)", re.DOTALL)
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page(?![s])")
_PARENT_RE = re.compile(rb"/Parent\s+(\d+)\s+0\s+R")


_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+\d+\s+obj\b")


def _scan_objects(data: bytes) -> dict[int, bytes]:
    """Length-aware object scan.

    A plain non-greedy ``obj(.*?)endobj`` regex truncates at the first
    LITERAL "endobj" inside Flate-compressed stream data (the same
    failure mode as "endstream", observed in real pdfTeX output) — so
    when an object carries a stream with a direct /Length, skip that
    many bytes before looking for the real endobj."""
    objects: dict[int, bytes] = {}
    pos = 0
    n = len(data)
    while pos < n:
        m = _OBJ_HEAD_RE.search(data, pos)
        if m is None:
            break
        num = int(m.group(1))
        body_start = m.end()
        e = data.find(b"endobj", body_start)
        sm = _STREAM_START_RE.search(data, body_start, e if e >= 0 else n)
        if sm is not None:
            lm = _LENGTH_RE.search(data, body_start, sm.start())
            if lm:
                after = sm.end() + int(lm.group(1))
                if after <= n:
                    e2 = data.find(b"endobj", after)
                    if e2 >= 0:
                        e = e2
        if e < 0:
            objects[num] = data[body_start:]
            break
        objects[num] = data[body_start:e]  # later definitions win (spec)
        pos = e + 6
    return objects


def _parse_objects(data: bytes) -> dict[int, bytes]:
    if not is_pdf_payload(data):
        raise ValueError("not a PDF payload (missing %PDF magic)")
    objects = _scan_objects(data)
    # PDF 1.5+ compressed object streams (/Type /ObjStm): real writers
    # (pdfTeX, cairo, ...) park the page tree and page dicts inside a
    # Flate-compressed stream — expand them so page counting / fan-out /
    # text extraction see modern PDFs, not just our own writer's output.
    for num in list(objects):
        body = objects[num]
        if b"/ObjStm" not in body:
            continue
        if b"/Predictor" in body:
            continue  # PNG-predictor ObjStm (rare) — not decoded here
        m_n = _OBJSTM_N_RE.search(body)
        m_first = _OBJSTM_FIRST_RE.search(body)
        if not m_n or not m_first:
            continue
        try:
            decoded = _decode_stream(body)
        except Exception:
            continue
        n, first = int(m_n.group(1)), int(m_first.group(1))
        header = decoded[:first].split()
        if len(header) < 2 * n:
            continue
        pairs = [(int(header[2 * i]), int(header[2 * i + 1])) for i in range(n)]
        for k, (onum, off) in enumerate(pairs):
            end = first + pairs[k + 1][1] if k + 1 < n else len(decoded)
            # Direct (uncompressed) definitions win on conflict. Known
            # limitation of the no-xref scanner (ADVICE r4): an
            # incrementally-updated PDF whose NEWER copy of an object
            # lives in an ObjStm while a stale direct definition
            # remains earlier in the file resolves to the stale one —
            # picking the live definition requires parsing the xref
            # stream, which this scanner deliberately skips (it exists
            # to read the torn/corrupt files xref-driven readers
            # reject). Incremental updates are vanishingly rare in
            # crawl payloads; revisit if they matter.
            objects.setdefault(onum, decoded[first + off:end])
    return objects


def _page_object_numbers(objects: dict[int, bytes]) -> list[int]:
    # Prefer the page tree (document order), expanding NESTED /Pages
    # nodes (balanced trees are what real writers emit); fall back to a
    # /Type /Page scan.
    roots = [
        num for num, body in objects.items()
        if b"/Type" in body and b"/Pages" in body and _KIDS_RE.search(body)
    ]
    # the root is the /Pages node no other /Pages node references
    kid_refs: set[int] = set()
    for num in roots:
        kids = _KIDS_RE.search(objects[num])
        kid_refs.update(int(m.group(1)) for m in _REF_RE.finditer(kids.group(1)))
    top = [num for num in roots if num not in kid_refs] or roots[:1]
    if top:
        out: list[int] = []
        seen: set[int] = set()

        def expand(num: int) -> None:
            if num in seen:  # cycle guard on corrupt trees
                return
            seen.add(num)
            body = objects.get(num, b"")
            kids = _KIDS_RE.search(body)
            if kids and b"/Pages" in body:
                for m in _REF_RE.finditer(kids.group(1)):
                    expand(int(m.group(1)))
            elif _PAGE_TYPE_RE.search(body) or (body and not kids):
                out.append(num)

        expand(top[0])
        if out:
            return out
    return [num for num in sorted(objects) if _PAGE_TYPE_RE.search(objects[num])]


def pdf_page_count(data: bytes) -> int:
    """Page-count probe (reference: pdf_render.py:16-25)."""
    return len(_page_object_numbers(_parse_objects(data)))


_STREAM_START_RE = re.compile(rb"stream\r?\n")
# (?!\d) pins the match to the FULL digit run first: without it the
# engine backtracks "/Length 123 0 R" to group "12" and the indirect-
# length guard never fires (code-review r4b, verified by execution)
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(?!\d)(?!\s+0\s+R)")


def _decode_stream(body: bytes) -> bytes:
    sm = _STREAM_START_RE.search(body)
    if sm is None:
        return b""
    start = sm.end()
    # Delimit by /Length when it is a direct value: compressed data can
    # contain the LITERAL bytes "endstream" (seen in real pdfTeX
    # output), so a first-match scan truncates mid-stream. Indirect
    # /Length (N 0 R) falls back to the LAST endstream marker.
    lm = _LENGTH_RE.search(body[:sm.start()])
    if lm:
        raw = body[start:start + int(lm.group(1))]
    else:
        end = body.rfind(b"endstream")
        if end < 0:
            end = len(body)
        raw = body[start:end]
        if raw.endswith(b"\r\n"):
            raw = raw[:-2]
        elif raw.endswith((b"\n", b"\r")):
            raw = raw[:-1]
    if b"/FlateDecode" in body:
        raw = zlib.decompress(raw)
    elif b"/Filter" in body:
        raise ValueError("unsupported PDF stream filter")
    return raw


_ESCAPES = {
    b"n": b"\n",
    b"r": b"\r",
    b"t": b"\t",
    b"b": b"\b",
    b"f": b"\f",
    b"(": b"(",
    b")": b")",
    b"\\": b"\\",
}


_NUM_RE = re.compile(rb"[-+]?\d*\.?\d+")
_WS_RE = re.compile(rb"\s+")
_NAME_RE = re.compile(rb"/\S*")
_OP_RE = re.compile(rb"[^\s()\[\]/]+")
_STR_RUN_RE = re.compile(rb"[^\\()]+")  # escape-free run inside a string


def _read_pdf_string(stream: bytes, start: int) -> tuple[str, int]:
    """Read a ( ... ) string starting at ``start`` (the open paren).

    Escape-free runs are copied in bulk via regex; only backslash
    escapes and paren nesting take the per-byte path.
    """
    out = bytearray()
    depth = 1
    i = start + 1
    n = len(stream)
    while i < n and depth > 0:
        m = _STR_RUN_RE.match(stream, i)
        if m:
            out += m.group()
            i = m.end()
            if i >= n:
                break
        b = stream[i]
        if b == 0x5C:  # backslash escape
            nxt = stream[i + 1:i + 2]
            if nxt.isdigit():
                k = 1
                while k <= 3 and stream[i + k:i + k + 1].isdigit():
                    k += 1
                octal = stream[i + 1:i + k]
                out += bytes([int(octal, 8) & 0xFF])
                i += 1 + len(octal)
            else:
                out += _ESCAPES.get(nxt, nxt)
                i += 2
            continue
        if b == 0x28:  # (
            depth += 1
            out += b"("
            i += 1
        elif b == 0x29:  # )
            depth -= 1
            if depth == 0:
                i += 1
                break
            out += b")"
            i += 1
    return out.decode("latin-1"), i


# -- ToUnicode CMaps (real-writer text fidelity) ----------------------------
#
# Subset fonts from real writers (pdfTeX, cairo/fop) re-encode glyphs at
# arbitrary codes (ligature 'fi' at 0x02/0x0C, ...) and publish the
# code→Unicode mapping as a /ToUnicode CMap stream per font. Without it
# extracted text carries the raw subset codes; with it, extraction is
# faithful. Codes are mapped per the font ACTIVE at each show operator
# (tracked via ``Tf``).

_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.DOTALL)
_BFRANGE_SEC_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.DOTALL)
_BFRANGE_RE = re.compile(
    rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*(\[(?:\s*<[0-9A-Fa-f]+>)*\s*\]|<[0-9A-Fa-f]+>)"
)
_HEX_PAIR_RE = re.compile(rb"<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>")
_HEX_ONE_RE = re.compile(rb"<([0-9A-Fa-f]+)>")
_FONT_ENTRY_RE = re.compile(rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+0\s+R")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+0\s+R")


def _utf16be(hexs: bytes) -> str:
    try:
        return bytes.fromhex(hexs.decode("ascii")).decode("utf-16-be", "replace")
    except ValueError:
        return ""


def _parse_tounicode(cmap: bytes) -> tuple[int, dict[int, str]]:
    """CMap stream → (code width in bytes, code→unicode map)."""
    out: dict[int, str] = {}
    width = 1
    for m in _BFCHAR_RE.finditer(cmap):
        for src, dst in _HEX_PAIR_RE.findall(m.group(1)):
            width = max(width, len(src) // 2)
            out[int(src, 16)] = _utf16be(dst)
    for sec in _BFRANGE_SEC_RE.finditer(cmap):
        for lo_h, hi_h, dst in _BFRANGE_RE.findall(sec.group(1)):
            lo, hi = int(lo_h, 16), int(hi_h, 16)
            width = max(width, len(lo_h) // 2)
            if hi - lo > 0xFFFF:
                continue  # corrupt range bomb
            if dst.startswith(b"["):
                targets = _HEX_ONE_RE.findall(dst)
                for k, t in enumerate(targets[: hi - lo + 1]):
                    out[lo + k] = _utf16be(t)
            else:
                base_h = _HEX_ONE_RE.search(dst).group(1)
                base = int(base_h, 16)
                for k in range(hi - lo + 1):
                    out[lo + k] = _utf16be(b"%0*x" % (len(base_h), base + k))
    return width, out


def _read_balanced_dict(data: bytes, start: int) -> bytes:
    """``<< ... >>`` starting at ``start`` with nesting → full dict bytes."""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i:i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return data[start:i]
        else:
            i += 1
    return data[start:]


def _resolve_dict(objects: dict[int, bytes], body: bytes, key: bytes) -> bytes:
    """``/Key`` in ``body`` → the dict bytes it denotes (inline or ref)."""
    at = body.find(key)
    if at < 0:
        return b""
    i = at + len(key)
    n = len(body)
    while i < n and body[i] in b" \t\r\n":
        i += 1
    if body.startswith(b"<<", i):
        return _read_balanced_dict(body, i)
    m = re.match(rb"(\d+)\s+0\s+R", body[i:i + 32])
    if m:
        return objects.get(int(m.group(1)), b"")
    return b""


def _page_fontmaps(objects: dict[int, bytes],
                   page_obj: int) -> dict[str, tuple[int, dict[int, str]]]:
    """Font-name → (code width, ToUnicode map) for a page's resources.

    Falls back to the page-tree root's resources when the page dict
    inherits them (PDF resource inheritance)."""
    maps: dict[str, tuple[int, dict[int, str]]] = {}
    body = objects.get(page_obj, b"")
    res = _resolve_dict(objects, body, b"/Resources")
    # PDF resource INHERITANCE follows the page's /Parent chain — a
    # balanced tree can carry different /Resources per subtree, so a
    # scan over all /Pages nodes could grab the wrong one (r4b review).
    seen = {page_obj}
    cur = body
    while not res:
        pm = _PARENT_RE.search(cur)
        if pm is None:
            break
        parent = int(pm.group(1))
        if parent in seen:
            break  # cycle in a corrupt tree
        seen.add(parent)
        cur = objects.get(parent, b"")
        res = _resolve_dict(objects, cur, b"/Resources")
    fonts = _resolve_dict(objects, res, b"/Font") if res else b""
    for name, num in _FONT_ENTRY_RE.findall(fonts):
        font_body = objects.get(int(num), b"")
        m = _TOUNICODE_RE.search(font_body)
        if not m:
            continue
        try:
            cmap = _decode_stream(objects.get(int(m.group(1)), b""))
        except Exception:
            continue
        width, table = _parse_tounicode(cmap)
        if table:
            maps[name.decode("latin-1")] = (width, table)
    return maps


def _apply_fontmap(text: str, fontmap: tuple[int, dict[int, str]]) -> str:
    width, table = fontmap
    if width <= 1:
        return "".join(table.get(ord(c), c) for c in text)
    out = []
    for k in range(0, len(text) - 1, 2):
        code = (ord(text[k]) << 8) | ord(text[k + 1])
        out.append(table.get(code, ""))
    return "".join(out)


def _extract_positioned_strings(
    stream: bytes,
    fontmaps: dict[str, tuple[int, dict[int, str]]] | None = None,
) -> list[tuple[float, float, str]]:
    """Tokenize a content stream → list of (y, x, text) chunks.

    Regex-scanned (whitespace runs, numbers, names, operators in one
    match each) — 2.8× the byte-at-a-time form it replaced, verified
    token-for-token identical on every fixture stream plus randomized
    operator-sequence fuzz.
    """
    chunks: list[tuple[float, float, str]] = []
    x = y = 0.0
    leading = 14.0
    stack: list[float] = []
    in_array = False
    last_name = ""
    cur_font: tuple[int, dict[int, str]] | None = None
    i = 0
    n = len(stream)
    pending: list[str] = []  # strings seen since last operator

    while i < n:
        m = _WS_RE.match(stream, i)
        if m:
            i = m.end()
        if i >= n:
            break
        b = stream[i]
        if b == 0x28:  # ( — string
            s, i = _read_pdf_string(stream, i)
            # map per SOURCE string (the kern-inferred spaces appended
            # below must stay literal, and 2-byte codes must pair
            # within one string, never across the inferred space)
            pending.append(_apply_fontmap(s, cur_font) if cur_font else s)
            continue
        if b == 0x3C:  # < — hex string (<< is a dict delimiter: skip)
            if stream[i + 1:i + 2] == b"<":
                i += 2
                continue
            gt = stream.find(b">", i + 1)
            if gt < 0:
                i += 1
                continue
            hx = _WS_RE.sub(b"", stream[i + 1:gt])
            if len(hx) % 2:
                hx += b"0"  # spec: odd-length hex string pads a 0
            try:
                hs = bytes.fromhex(hx.decode("ascii")).decode("latin-1")
            except ValueError:
                hs = ""
            if hs:
                pending.append(_apply_fontmap(hs, cur_font) if cur_font else hs)
            i = gt + 1
            continue
        if b == 0x5B:  # [ — TJ array open
            in_array = True
            i += 1
            continue
        if b == 0x5D:  # ] — TJ array close
            in_array = False
            i += 1
            continue
        m = _NUM_RE.match(stream, i)
        if m:
            val = float(m.group())
            if in_array:
                # TJ kern adjustments (thousandths of em, negative =
                # rightward gap): real writers (TeX, cairo) encode the
                # inter-WORD space as a large negative kern instead of
                # a space glyph — infer it, pdfminer word_margin style.
                # Small kerns (letter fitting, > -150) stay invisible.
                if val < -150 and pending:
                    pending.append(" ")
            else:
                stack.append(val)
            i = m.end()
            continue
        if b == 0x2F:  # /name (runs to whitespace)
            nm = _NAME_RE.match(stream, i)
            last_name = nm.group()[1:].decode("latin-1")
            i = nm.end()
            continue
        m = _OP_RE.match(stream, i)
        if m:
            op = m.group()
            j = m.end()
        else:  # lone ')' etc: empty operator, step over
            op = b""
            j = i
        if op in (b"Td", b"TD"):
            if len(stack) >= 2:
                x += stack[-2]
                y += stack[-1]
                if op == b"TD":
                    leading = -stack[-1] if stack[-1] < 0 else leading
        elif op == b"Tm":
            if len(stack) >= 6:
                x, y = stack[-2], stack[-1]
        elif op == b"T*":
            y -= leading
        elif op == b"TL":
            if stack:
                leading = stack[-1]
        elif op == b"BT":
            x = y = 0.0
        elif op == b"Tf" and fontmaps is not None:
            cur_font = fontmaps.get(last_name)
        if op in (b"Tj", b"TJ", b"'", b'"'):
            text = "".join(pending)
            if op in (b"'", b'"'):
                y -= leading
            if text:
                chunks.append((y, x, text))
        pending.clear()
        stack.clear()
        i = j if j > i else i + 1
    return chunks


def _render_page(objects: dict[int, bytes], page_obj: int,
                 columns: bool = False,
                 min_column_gap: float = 50.0) -> str:
    body = objects.get(page_obj, b"")
    m = _CONTENTS_RE.search(body)
    if m is None:
        return ""
    # /Contents may be one ref, an inline array of refs, or a ref to an
    # ARRAY OBJECT of refs (Ghostscript's shape) — follow refs, and when
    # a target has no stream, recurse into the refs it contains.
    def streams_of(nums: list[int], depth: int = 0) -> list[bytes]:
        parts: list[bytes] = []
        for num in nums:
            target = objects.get(num, b"")
            if _STREAM_START_RE.search(target):
                parts.append(_decode_stream(target))
            elif depth < 2:
                inner = [int(r.group(1)) for r in _REF_RE.finditer(target)]
                parts.extend(streams_of(inner, depth + 1))
        return parts

    stream = b"\n".join(
        streams_of([int(r.group(1)) for r in _REF_RE.finditer(m.group(1))])
    )
    chunks = _extract_positioned_strings(stream, _page_fontmaps(objects, page_obj))
    if columns:
        return _render_columns(chunks, min_column_gap)
    return _render_lines(chunks)


def _render_lines(chunks: list[tuple[float, float, str]]) -> str:
    """Group positioned chunks into lines by quantized y, top-down;
    left-to-right within a line."""
    lines: dict[float, list[tuple[float, str]]] = {}
    for cy, cx, text in chunks:
        key = round(cy * 2) / 2
        lines.setdefault(key, []).append((cx, text))
    rendered = []
    for key in sorted(lines, reverse=True):
        rendered.append(" ".join(t for _, t in sorted(lines[key], key=lambda p: p[0])))
    return "\n".join(rendered)


def _render_columns(chunks: list[tuple[float, float, str]],
                    min_column_gap: float) -> str:
    """Column-aware reading order (pdfminer-style layout analysis,
    scaled to what a no-font-metrics scanner can know).

    A plain y-sort INTERLEAVES multi-column text (left line 1, right
    line 1, left line 2, …). This pass splits the page at persistent
    vertical whitespace bands — gaps ≥ ``min_column_gap`` points
    between the sorted distinct chunk x-starts — and renders each
    column fully (top-down) before moving right, joining columns with
    a blank line.

    Known limits, by construction: chunk WIDTHS are unknown (no glyph
    metrics in the scanner), so the split keys on start positions —
    a chunk that *starts* left of a gap but extends across it stays in
    the left column, and a full-width heading sorts into the column
    its x-start falls in (pdfminer has the same ambiguity class).
    Pages whose chunk starts pepper the full width (per-word TJ
    positioning) produce no persistent gap and fall back to the
    line-order render, which is the correct answer for them.
    """
    import bisect

    if not chunks:
        return ""
    xs = sorted({cx for _, cx, _ in chunks})
    splits = [
        (a + b) / 2 for a, b in zip(xs, xs[1:]) if b - a >= min_column_gap
    ]
    if not splits:
        return _render_lines(chunks)
    cols: list[list[tuple[float, float, str]]] = [
        [] for _ in range(len(splits) + 1)
    ]
    for ch in chunks:
        cols[bisect.bisect(splits, ch[1])].append(ch)
    return "\n\n".join(_render_lines(c) for c in cols if c)


def extract_pdf_page_text(data: bytes, page_index: int) -> str:
    """(pdf bytes, page index) → reconstructed page text.

    Lines ordered top-to-bottom (descending y), chunks within a line
    left-to-right (ascending x), joined with single spaces.
    Raises ``IndexError`` on an out-of-range page (reference guard:
    pdf_render.py:39-52) and ``ValueError`` on a non-PDF payload.
    """
    objects = _parse_objects(data)
    page_nums = _page_object_numbers(objects)
    if page_index < 0 or page_index >= len(page_nums):
        raise IndexError(
            f"page_index {page_index} out of range for {len(page_nums)}-page PDF"
        )
    return _render_page(objects, page_nums[page_index])


def extract_pdf_page_text_columns(data: bytes, page_index: int,
                                  min_column_gap: float = 50.0) -> str:
    """Column-aware variant of :func:`extract_pdf_page_text` — the
    pdfminer-style layout-reconstruction mode: multi-column pages read
    column-by-column instead of y-interleaved. Single-column pages
    (no persistent vertical gap) render identically to the plain
    function. Kept SEPARATE from the default so the golden
    byte-equality contract on the fused extraction path never moves.
    """
    objects = _parse_objects(data)
    page_nums = _page_object_numbers(objects)
    if page_index < 0 or page_index >= len(page_nums):
        raise IndexError(
            f"page_index {page_index} out of range for {len(page_nums)}-page PDF"
        )
    return _render_page(objects, page_nums[page_index], columns=True,
                        min_column_gap=min_column_gap)


class PdfDocument:
    """Parse ONCE, render pages on demand.

    The fused extraction batch emits all of a PDF's pages back-to-back;
    the per-page function would re-parse the object table per page (and
    once more for the count). This handle amortizes the parse over the
    document while keeping per-page error isolation (a page that fails
    to render fails alone). ``page_text(i)`` equals
    ``extract_pdf_page_text(data, i)`` exactly (tested); the per-page
    function stays for the staged path, whose rows arrive one page at a
    time.
    """

    __slots__ = ("_objects", "_pages")

    def __init__(self, data: bytes) -> None:
        self._objects = _parse_objects(data)
        self._pages = _page_object_numbers(self._objects)

    @property
    def page_count(self) -> int:
        return len(self._pages)

    def page_text(self, page_index: int, columns: bool = False,
                  min_column_gap: float = 50.0) -> str:
        if page_index < 0 or page_index >= len(self._pages):
            raise IndexError(
                f"page_index {page_index} out of range for "
                f"{len(self._pages)}-page PDF"
            )
        return _render_page(self._objects, self._pages[page_index],
                            columns=columns, min_column_gap=min_column_gap)
