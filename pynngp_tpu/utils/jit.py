"""Late-bound jit: thread large closed-over arrays through ``jit`` as
arguments instead of baking them into the program as constants.

Why this exists: a jitted sampler step closes over the model's data tables
(the Pallas lane cache, neighbor tables, distance caches).  ``jax.jit``
lowers closed-over concrete arrays as HLO *constants* — the serialized
program then contains the tables themselves.  Remote-compile services put a
hard size limit on the request body (observed: HTTP 413 at n=500k, m=20
where the lane cache alone is ~400 MB), and even locally constant-baked
programs bloat compile time and cache size.  ``jax.closure_convert`` cannot
help: it only hoists top-level jaxpr constants, not those captured inside
``custom_vjp`` sub-jaxprs (the fused Pallas VJP path).

The pattern here keeps every sampler/driver signature closure-based and
fixes the boundary instead:

- models wrap their big, immutable data pytrees in :class:`DataRef` and
  read them back through ``ref()`` at trace time;
- driver jit sites use :func:`jit_bound` instead of ``jax.jit``; it passes
  the contents of every live ``DataRef`` as a leading pytree argument and,
  while tracing, makes each ``ref()`` return the corresponding tracer.

Unused refs cost nothing: jit prunes arguments the traced program never
reads, and device-resident arrays are passed by reference.
"""

from __future__ import annotations

import weakref

import jax

__all__ = ["DataRef", "jit_bound"]

_MISSING = object()
_REGISTRY: list = []  # weakrefs to every DataRef, in creation order


class DataRef:
    """An immutable pytree of (device) arrays, readable at trace time.

    ``ref()`` returns the concrete value outside :func:`jit_bound`, and the
    in-trace tracer substitute inside it.  The held pytree must not be
    mutated after construction (its treedef keys the jit cache).
    """

    __slots__ = ("_value", "_override", "__weakref__")

    def __init__(self, value):
        self._value = value
        self._override = _MISSING
        _REGISTRY.append(weakref.ref(self))

    def get(self):
        return self._value if self._override is _MISSING else self._override

    __call__ = get

    @property
    def value(self):
        return self._value


def _live_refs():
    out = []
    alive = []
    for wr in _REGISTRY:
        r = wr()
        if r is not None:
            out.append(r)
            alive.append(wr)
    _REGISTRY[:] = alive
    return out


def jit_bound(fn, refs=None, **jit_kwargs):
    """``jax.jit(fn)`` with :class:`DataRef` contents threaded as arguments.
    Use at driver-level jit sites whose closures may capture model data
    through DataRefs.

    ``refs``: optional explicit tuple of DataRefs reachable from ``fn``
    (e.g. a model's own ref).  When omitted, the live-ref set is snapshotted
    at the FIRST call and reused for every later call — so constructing
    another model mid-run cannot change this callable's leading pytree
    structure (which would force a retrace of in-flight chunked samplers).
    """
    state = {"refs": None if refs is None else tuple(refs)}

    def wrapped(ref_vals, *args):
        rs = state["refs"]
        olds = [r._override for r in rs]
        for r, v in zip(rs, ref_vals):
            r._override = v
        try:
            return fn(*args)
        finally:
            for r, o in zip(rs, olds):
                r._override = o

    jf = jax.jit(wrapped, **jit_kwargs)

    def call(*args):
        if state["refs"] is None:
            state["refs"] = tuple(_live_refs())
        return jf(tuple(r._value for r in state["refs"]), *args)

    call._jitted = jf  # for inspection/tests
    return call
