"""Pin the XLA cost-analysis behaviors bench.py's FLOPs accounting relies on.

bench._train_flops_exact recovers true episode FLOPs from the difference of
two lowerings at scan unroll 1 and 2, assuming:

1. cost analysis counts a `lax.scan`/while body ONCE regardless of trip
   count (the bug being corrected), and
2. at unroll=u the body appears u + trip%u times in the HLO (u inlined
   copies in the while loop plus the remainder epilogue).

If a jax/XLA upgrade changes either, the benchmark's MFU numbers silently
go wrong — this test fails instead. Also covers the hlo_census parser on
tuple-result instructions (multi-output fusions / while / conditional),
which a space-free shape regex silently skipped.
"""
import jax
import jax.numpy as jnp
import pytest


def _flops(n, u, dim=64):
    def f(x):
        def body(c, _):
            return c @ x, None
        c, _ = jax.lax.scan(body, x, None, length=n, unroll=u)
        return c.sum()

    x = jax.ShapeDtypeStruct((dim, dim), jnp.float32)
    lowered = jax.jit(f).lower(x)
    ca = lowered.cost_analysis()
    if not ca or (not isinstance(ca, (list, tuple)) and not ca.get('flops')):
        ca = lowered.compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca['flops'])


def test_scan_body_counted_once():
    """Trip count does not change analyzed flops at unroll=1."""
    assert _flops(3, 1) == _flops(30, 1)


@pytest.mark.parametrize('n,u', [(6, 2), (5, 2), (7, 3), (5, 5)])
def test_unroll_body_multiplicity(n, u):
    """f(u) - f(1) == (u - 1 + n % u) * body, the identity
    bench._train_flops_exact inverts."""
    f1, fu = _flops(n, 1), _flops(n, u)
    body = fu - f1
    expected_extra = (u - 1) + (n % u)
    # recover one body from the full-unroll reference: n bodies total
    fn = _flops(n, n)
    one_body = (fn - f1) / (n - 1)
    assert body == pytest.approx(expected_extra * one_body, rel=1e-6)


def test_census_counts_tuple_results():
    from rmem_ocu_tpu.tools.hlo_census import ASYNC_OPS, census
    hlo = '\n'.join([
        'HloModule m',
        '',
        'ENTRY %main (p0: f32[8]) -> f32[8] {',
        '  %p0 = f32[8]{0} parameter(0)',
        '  %t = (f32[8]{0}, s32[]) fusion(%p0), kind=kLoop, calls=%fc',
        '  %w = (f32[8]{0}, s32[]) while(%t), condition=%c, body=%b',
        '  %cs = (f32[8]{0:S(1)}, f32[8]{0}, u32[]) copy-start(%p0)',
        '  %cd = f32[8]{0:S(1)} copy-done(%cs)',
        '  ROOT %r = f32[8]{0} add(%cd, %cd)',
        '}',
    ])
    counts, rows = census(hlo)
    assert counts['fusion'] == 1          # tuple-result fusion counted
    assert counts['while'] == 1           # tuple-result while counted
    assert counts['copy-start'] == 1 and counts['copy-done'] == 1
    assert counts['add'] == 1
    assert 'parameter' not in counts      # free op
    seq = sum(c for op, c in counts.items() if op not in ASYNC_OPS)
    assert seq == 3                       # fusion + while + add
