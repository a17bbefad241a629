"""Opaque, validated pagination cursors (reference: api/reader.rs).

The reference returns pagination state to the client as an OPAQUE hex
string and re-validates it structurally on every request instead of
trusting it.  Two wire formats, mirrored here:

* **score fast path** (default relevance sort, reader.rs:614-692): a
  fixed 21-byte buffer, hex-encoded to 42 chars —
  ``version u8 | generation u32 | score f32-bits | segment_ord u32 |
  doc_id u32 | returned u32`` (big-endian).  ``segment_ord`` is always
  0 in this engine: the lake layout has one logical segment (doc_id is
  globally unique), so the field is carried for wire parity only.
  Doc ids above u32 range (the reference's per-segment ids are u32, so
  it can never emit one) transparently fall back to the sort-state
  format below.
* **sort path** (explicit sort plan, reader.rs:694-757, 871-901): a
  hex-encoded JSON ``SortCursorState`` — ``version`` 2, ``generation``,
  ``returned``, ``plan_hash``, ``segment_ord``, ``doc_id`` and the
  typed sort ``values`` (``{"t": "score"|"i64"|"f64"|"str"|"missing",
  "v": ...}``, the serde adjacently-tagged layout).

Validation mirrors the reference error-for-error (reader.rs:651-692,
821-869): wrong hex length, non-hex bytes, unsupported version, stale
generation, sort-plan mismatch (``plan_hash``), and the
``MAX_CURSOR_ADVANCE = 50_000`` pagination depth cap (reader.rs:55) —
a deep-paging client must switch to index-order scans past 50k hits,
exactly the reference's contract.  There is deliberately no MAC: like
the reference, the cursor is tamper-*rejecting* (any structural edit,
generation splice, or sort-plan swap errors loudly), not
tamper-*proof* — it carries no secrets, only resume position.
"""

from __future__ import annotations

import json
import struct
import zlib

CURSOR_VERSION = 1
SORT_CURSOR_VERSION = 2
CURSOR_BYTES = 21
CURSOR_HEX_LEN = CURSOR_BYTES * 2
MAX_CURSOR_ADVANCE = 50_000

_U32 = 0xFFFFFFFF


class CursorError(ValueError):
    """Invalid, stale, or over-deep pagination cursor."""


class F32Score(float):
    """A score that round-tripped through f32 bits on the wire (the
    reference stores scores as f32 in both cursor formats).  The resume
    comparison must then also run in f32 space — the engine's column is
    f64, and comparing an f32-rounded literal against f64 values would
    duplicate or drop the boundary row."""


def generation_u32(generation) -> int:
    """Fold the manifest's build-id string into the u32 generation slot
    the wire format carries (the reference's manifest generation is
    already a u32 counter; ours is a uuid, so it is crc32-folded)."""
    return zlib.crc32(str(generation).encode("utf-8")) & _U32


def plan_hash_u32(specs) -> int:
    """u32 hash of the canonical sort plan [(field, order), ...] — a
    cursor replayed under a different sort errors instead of silently
    resuming a different ordering (reader.rs:853-856)."""
    canon = json.dumps([[f, o] for f, o in specs], separators=(",", ":"))
    return zlib.crc32(canon.encode("utf-8")) & _U32


def _f32_bits(score: float) -> int:
    return struct.unpack(">I", struct.pack(">f", float(score)))[0]


def _bits_f32(bits: int) -> float:
    return float(struct.unpack(">f", struct.pack(">I", bits & _U32))[0])


def _hex_decode(raw: str) -> bytes:
    if len(raw) % 2 != 0:
        raise CursorError("invalid cursor: expected even-length hex string")
    try:
        return bytes.fromhex(raw)
    except ValueError:
        raise CursorError("invalid cursor: non-hex byte") from None


def _typed(v):
    """Python sort value -> adjacently-tagged CursorValue."""
    if v is None:
        return {"t": "missing"}
    if isinstance(v, bool):  # bool is int's subclass; reject explicitly
        raise CursorError(f"unsupported sort value type {type(v).__name__}")
    if isinstance(v, int):
        return {"t": "i64", "v": int(v)}
    if isinstance(v, float):
        return {"t": "f64", "v": float(v)}
    if isinstance(v, str):
        return {"t": "str", "v": v}
    raise CursorError(f"unsupported sort value type {type(v).__name__}")


def _untyped(cv):
    t = cv.get("t")
    if t == "missing":
        return None
    if t == "score":
        return F32Score(_bits_f32(int(cv["v"])))
    if t in ("i64", "f64", "str"):
        return cv["v"]
    raise CursorError(f"unsupported cursor value tag {t!r}")


def encode_cursor(
    generation,
    returned: int,
    values: list,
    doc_id: int,
    specs,
    score_fast_path: bool,
) -> str:
    """Pack the resume position into an opaque hex string.

    ``values`` has one entry per sort spec (``_score`` entries are f32
    scores); ``returned`` is the total hits handed out so far (page
    offset), validated against MAX_CURSOR_ADVANCE on decode."""
    gen = generation_u32(generation)
    if score_fast_path and 0 <= int(doc_id) <= _U32:
        buf = struct.pack(
            ">BIIIII",  # 1 version byte + 5 u32s = 21 bytes
            CURSOR_VERSION,
            gen,
            _f32_bits(values[0]),
            0,  # segment_ord: single logical segment
            int(doc_id),
            int(returned) & _U32,
        )
        return buf.hex()
    tv = []
    for (fld, _order), v in zip(specs, values):
        if fld == "_score":
            tv.append({"t": "score", "v": _f32_bits(v)})
        else:
            tv.append(_typed(v))
    state = {
        "version": SORT_CURSOR_VERSION,
        "generation": gen,
        "returned": int(returned),
        "plan_hash": plan_hash_u32(specs),
        "segment_ord": 0,
        "doc_id": int(doc_id),
        "values": tv,
    }
    return json.dumps(state, separators=(",", ":")).encode("utf-8").hex()


def decode_cursor(raw: str, generation, specs) -> tuple[list, int, int]:
    """Validate + unpack an opaque cursor.

    Returns ``(values, doc_id, returned)`` where ``values`` lines up
    with the sort specs (score entries as f32 floats).  Raises
    CursorError on every malformed/stale/mismatched/over-deep case the
    reference rejects."""
    if not isinstance(raw, str):
        raise CursorError("cursor must be a hex string")
    gen = generation_u32(generation)
    if len(raw) == CURSOR_HEX_LEN:
        # a JSON sort state is always far longer than 21 bytes, so the
        # length alone discriminates the two formats (as it does in the
        # reference: the score path checks the exact length first)
        buf = _hex_decode(raw)
        version, cgen, score_bits, _seg, doc_id, returned = struct.unpack(
            ">BIIIII", buf
        )
        if version != CURSOR_VERSION:
            raise CursorError(f"unsupported cursor version {version}")
        if cgen != gen:
            raise CursorError(
                f"stale cursor for this index generation: expected {gen}, "
                f"got {cgen}"
            )
        if returned > MAX_CURSOR_ADVANCE:
            raise CursorError(
                f"cursor requests {returned} hits, which exceeds max "
                f"supported {MAX_CURSOR_ADVANCE}"
            )
        if [(f, o) for f, o in specs] != [("_score", "desc")]:
            # the 21-byte format is only ever minted for the default
            # relevance sort (score desc); accepting it under any other
            # field OR order (e.g. _score asc) would silently resume
            # with the wrong boundary comparison
            raise CursorError("cursor sort order does not match this request")
        return [F32Score(_bits_f32(score_bits))], int(doc_id), int(returned)
    payload = _hex_decode(raw)  # hex errors first, as in the reference
    try:
        state = json.loads(payload.decode("utf-8"))
        if not isinstance(state, dict):
            raise ValueError
    except (ValueError, UnicodeDecodeError):
        raise CursorError("parsing sort cursor payload") from None
    if state.get("version") != SORT_CURSOR_VERSION:
        raise CursorError(
            f"unsupported sort cursor version {state.get('version')}"
        )
    if state.get("generation") != gen:
        raise CursorError(
            f"stale cursor for this index generation: expected {gen}, "
            f"got {state.get('generation')}"
        )
    if state.get("plan_hash") != plan_hash_u32(specs):
        raise CursorError("cursor sort order does not match this request")
    returned = int(state.get("returned", 0))
    if returned > MAX_CURSOR_ADVANCE:
        raise CursorError(
            f"cursor requests {returned} hits, which exceeds max "
            f"supported {MAX_CURSOR_ADVANCE}"
        )
    vals = state.get("values")
    if not isinstance(vals, list) or len(vals) != len(specs):
        raise CursorError("cursor value arity does not match the sort plan")
    return (
        [_untyped(v) for v in vals],
        int(state.get("doc_id", -1)),
        returned,
    )
