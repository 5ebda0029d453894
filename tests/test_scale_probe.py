"""Invariants for the in-plan scaling probe (tools/scale_probe.py).

The probe's evidence is only as good as its scaled views: a k-times
view must be an EXACT k-fold replica (row counts scale exactly,
referential integrity preserved across the shifted keys, aggregate
identities hold), or the measured "scaling curve" measures a broken
workload instead of a scaled one.
"""

from __future__ import annotations

import importlib.util
import os

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "scale_probe.py")
_spec = importlib.util.spec_from_file_location("scale_probe", _TOOL)
probe = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(probe)


def test_scaled_views_are_exact_k_fold_replicas(spark):
    probe.SF_DIR = "/root/testdata/sf0.001"
    probe.register_scaled(spark, 1)
    base = {
        t: spark.table(t).count()
        for t in ("lineitem", "orders", "customer", "documents", "events")
    }
    q1 = probe.kernels()["agg_scan_q1"]
    r1 = {tuple(r[:2]): r for r in spark.sql(q1).collect()}

    probe.register_scaled(spark, 3)
    for t, n in base.items():
        assert spark.table(t).count() == 3 * n, t
    # referential integrity survives the shift: every scaled lineitem
    # still joins an order, every order a customer
    orphans = spark.sql(
        "SELECT count(*) AS c FROM lineitem l LEFT ANTI JOIN orders o"
        " ON l.l_orderkey = o.o_orderkey"
    ).collect()[0].c
    assert orphans == 0
    orphans = spark.sql(
        "SELECT count(*) AS c FROM orders o LEFT ANTI JOIN customer c"
        " ON o.o_custkey = c.c_custkey"
    ).collect()[0].c
    assert orphans == 0
    # aggregate identity: same groups; extensive sums 3x, means fixed
    r3 = {tuple(r[:2]): r for r in spark.sql(q1).collect()}
    assert set(r3) == set(r1)
    for key, row1 in r1.items():
        row3 = r3[key]
        assert row3.count_order == 3 * row1.count_order
        assert abs(row3.sum_qty - 3 * row1.sum_qty) <= 1e-6 * abs(row3.sum_qty)
        assert abs(row3.avg_qty - row1.avg_qty) <= 1e-3


def test_probe_kernels_compile_and_run_at_k1(spark):
    probe.SF_DIR = "/root/testdata/sf0.001"
    probe.register_scaled(spark, 1)
    for name, obj in probe.kernels().items():
        df = spark.sql(obj) if isinstance(obj, str) else obj(spark)
        assert df.count() >= 0, name
