"""Shared RIFF chunk walker for the WAV (wavaudio.py) and AVI
(avivideo.py) kernels — one framing implementation so container fixes
land in both formats at once."""

from __future__ import annotations

import struct
from collections.abc import Iterator


def iter_riff_chunks(data: bytes, start: int, end: int, error_cls: type,
                     tolerate_overrun_fourcc: bytes | None = None,
                     ) -> Iterator[tuple[bytes, int, int]]:
    """Yield (fourcc, body_offset, body_size) for chunks in [start, end).

    Chunks are word-aligned (odd sizes padded by one byte). A chunk
    whose declared size overruns the container raises ``error_cls``,
    except the fourcc named by ``tolerate_overrun_fourcc`` (WAV 'data'
    chunks written by streaming encoders that patch sizes late), which
    is clipped to the available bytes instead.
    """
    pos = start
    while pos + 8 <= end:
        fourcc = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            if tolerate_overrun_fourcc is not None and fourcc == tolerate_overrun_fourcc:
                size = end - body
            else:
                raise error_cls(
                    f"RIFF chunk {fourcc!r} overruns container "
                    f"({body + size} > {end})"
                )
        yield fourcc, body, size
        pos = body + size + (size & 1)
