import pytest

from autorag_research_tpu.utils.normalize import (
    normalize_dbsf,
    normalize_minmax,
    normalize_tmm,
    normalize_zscore,
)


def test_minmax():
    assert normalize_minmax([1.0, 2.0, 3.0]) == [0.0, 0.5, 1.0]
    assert normalize_minmax([1.0, None, 3.0]) == [0.0, None, 1.0]
    assert normalize_minmax([2.0, 2.0]) == [0.5, 0.5]
    assert normalize_minmax([]) == []
    assert normalize_minmax([None, None]) == [None, None]


def test_tmm():
    assert normalize_tmm([0.0, 50.0, 100.0], theoretical_min=0.0) == [0.0, 0.5, 1.0]
    assert normalize_tmm([0.0, None, 100.0], 0.0) == [0.0, None, 1.0]
    assert normalize_tmm([0.0, 0.0], 0.0) == [0.5, 0.5]


def test_zscore():
    out = normalize_zscore([1.0, 2.0, 3.0])
    assert out[1] == 0.0
    assert out[0] == pytest.approx(-1.224744871)
    assert normalize_zscore([1.0, None, 3.0]) == [-1.0, None, 1.0]
    assert normalize_zscore([5.0, 5.0]) == [0.0, 0.0]


def test_dbsf():
    out = normalize_dbsf([1.0, 2.0, 3.0, 4.0, 5.0])
    # mean=3, std=sqrt(2): bounds 3 +- 3*sqrt(2)
    assert out[2] == pytest.approx(0.5)
    assert all(0.0 <= v <= 1.0 for v in out)
    out = normalize_dbsf([1.0, None, 3.0])
    assert out[1] is None
    assert normalize_dbsf([2.0, 2.0]) == [0.5, 0.5]
