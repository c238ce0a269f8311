"""Golden-corpus parity: parse every file in the reference Test/
corpus and require exact DOM + error-list equality with Test/ok/*.ok
(the reference's own test gate, test_sgml.pl:77-107)."""

import os

import pytest

from packages_sgml_spark.core import golden

pytestmark = pytest.mark.skipif(
    not os.path.isdir(golden.TEST_DIR),
    reason="reference Test corpus not available")


@pytest.mark.parametrize("base", golden.all_bases())
def test_golden(base):
    ok, detail = golden.run_one(base)
    assert ok, detail


def test_corpus_size():
    # all 46 inputs with goldens must be exercised
    assert len(golden.all_bases()) >= 46


def test_golden_pure_fsm():
    """The PURE char-at-a-time FSM (the bulk-collapse differential
    oracle, parser.PURE_FSM) must itself be byte-identical to the
    reference on the reference's own corpus — this is what licenses
    it as the oracle arm (r7).  One pass over all 46 inputs."""
    import packages_sgml_spark.core.parser as P
    P.PURE_FSM = True
    try:
        results = golden.run_all(verbose=False)
    finally:
        P.PURE_FSM = False
    bad = {k: v for k, v in results.items() if not v[0]}
    assert not bad, bad
    assert len(results) >= 46
