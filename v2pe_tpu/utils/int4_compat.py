"""Workaround for a sub-byte-dtype layout-metadata bug in experimental
PJRT client wrappers (observed on the 'axon' TPU tunnel platform).

Symptom: an ``jnp.int4`` array produced by one jitted program cannot be
passed into another — dispatch dies with ``RecursionError: Recursively
calling jit``. Root cause: the client reconstructs the producer's output
layout with ``sub_byte_element_size_in_bits=0`` while the consumer's
compiled executable expects the true ``4`` (same ``major_to_minor``, same
``tiling`` — e.g. ``T(8,128)(8,1)``, the nibble packing is in the tiling);
the equality check in ``jax._src.array._array_shard_arg`` then routes the
array through ``api.device_put(x, Format(...))``, whose implementation is
itself a jit taking an int4 argument — infinite recursion.

The on-device bytes are identical (both layouts describe the same packed
tiling); only the metadata field was dropped. The shim wraps the shard-arg
handler and, exactly when the two layouts differ ONLY in a zeroed
``sub_byte_element_size_in_bits`` on the array side, clears the expected
layout so the handler takes the fast same-layout path. Every other layout
mismatch still resharts as before.

This makes the int4 KV-cache tier (infer/paged_kv.py ``kv_dtype='int4'``)
usable across jit boundaries — the decode loop threads the pool through
donated jit calls every step.
"""

from __future__ import annotations

_installed = False


def install() -> None:
    global _installed
    if _installed:
        return
    _installed = True
    try:
        from jax._src import array as _jarray
        from jax._src.interpreters import pxla
    except Exception:  # pragma: no cover — jax internals moved
        return

    orig = pxla.shard_arg_handlers.get(_jarray.ArrayImpl)
    if orig is None:  # pragma: no cover
        return

    SUB = "_sub_byte_element_size_in_bits"

    def _meta_only_mismatch(x, want) -> bool:
        try:
            have = x.format.layout
        except Exception:
            return False
        if have is None or want is None:
            return False
        return (getattr(have, SUB, None) == 0
                and getattr(want, SUB, 0) not in (0, None)
                and have.major_to_minor == want.major_to_minor
                and have.tiling == want.tiling)

    def patched(xs, shardings, layouts, copy_semantics):
        fixed = [None if (lay is not None and _meta_only_mismatch(x, lay))
                 else lay
                 for x, lay in zip(xs, layouts)]
        return orig(xs, shardings, fixed, copy_semantics)

    pxla.shard_arg_handlers[_jarray.ArrayImpl] = patched
