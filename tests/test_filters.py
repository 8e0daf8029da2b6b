"""Filter compiler unit tests — semantics parity with the reference's
filter-compiler tests (reference tests/test_retrieval.py:122-152: single
value, OR-list, year-range, multi-field)."""

import numpy as np
import pytest

from automative_rag_tpu.index.filters import (
    FilterError,
    FilterSpec,
    MetadataColumns,
    compile_filter,
    eval_filter_mask,
)


def _make_columns(metadatas):
    cols = MetadataColumns()
    cols.append_rows(metadatas, capacity=128)
    return cols


@pytest.fixture
def columns():
    return _make_columns(
        [
            {"manufacturer": "BMW", "model": "X5", "year": 2022, "category": "suv"},
            {"manufacturer": "BMW", "model": "5 Series", "year": 2023, "category": "sedan"},
            {"manufacturer": "Tesla", "model": "Model 3", "year": 2023, "category": "sedan"},
            {"manufacturer": "Toyota", "model": "Camry", "year": 2021},
            {"model": "Unknown"},  # missing manufacturer/year
        ]
    )


def _mask(columns, flt):
    import jax.numpy as jnp

    spec = compile_filter(flt, columns)
    mask = eval_filter_mask(
        jnp.asarray(columns.codes), jnp.asarray(columns.numerics), spec
    )
    return np.asarray(mask)[: columns.count]


def test_match_all(columns):
    assert _mask(columns, None).all()
    assert _mask(columns, {}).all()


def test_single_value_equality(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"manufacturer": "BMW"}), [True, True, False, False, False]
    )


def test_or_list(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"manufacturer": ["BMW", "Tesla"]}),
        [True, True, True, False, False],
    )


def test_year_range_equality(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"year": 2023}), [False, True, True, False, False]
    )
    # float year behaves like the reference's Range gte=lte
    np.testing.assert_array_equal(
        _mask(columns, {"year": 2023.0}), [False, True, True, False, False]
    )


def test_year_list(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"year": [2021, 2022]}), [True, False, False, True, False]
    )


def test_multi_field_and(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"manufacturer": "BMW", "year": 2023}),
        [False, True, False, False, False],
    )


def test_unknown_value_matches_nothing(columns):
    assert not _mask(columns, {"manufacturer": "Porsche"}).any()


def test_missing_field_never_matches(columns):
    # row 4 has no manufacturer — must never satisfy a manufacturer filter
    assert not _mask(columns, {"manufacturer": ["BMW", "Tesla", "Toyota"]})[4]


def test_none_and_empty_skipped(columns):
    np.testing.assert_array_equal(
        _mask(columns, {"manufacturer": None, "model": [], "year": 2023}),
        [False, True, True, False, False],
    )


def test_unknown_field_raises(columns):
    with pytest.raises(FilterError):
        compile_filter({"vin_number": "abc"}, columns)


def test_too_many_terms_raises(columns):
    with pytest.raises(FilterError):
        compile_filter({"year": list(range(2000, 2020))}, columns)


def test_spec_is_fixed_shape(columns):
    spec = compile_filter({"manufacturer": "BMW"}, columns)
    blank = FilterSpec.match_all()
    for a, b in zip(spec, blank):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_randomized_filters_match_python_oracle(rng):
    """50 random filter dicts: the device bitmask must equal a direct
    Python evaluation of the DSL semantics."""
    import jax.numpy as jnp

    manus = ["宝马", "奔驰", "特斯拉", "丰田", None]
    models = ["X5", "5系", "Model 3", None]
    cats = ["suv", "sedan", None]
    metadatas = []
    for i in range(300):
        md = {}
        manu = manus[rng.integers(len(manus))]
        if manu:
            md["manufacturer"] = manu
        model = models[rng.integers(len(models))]
        if model:
            md["model"] = model
        cat = cats[rng.integers(len(cats))]
        if cat:
            md["category"] = cat
        if rng.random() < 0.8:
            md["year"] = int(2015 + rng.integers(10))
        metadatas.append(md)
    cols = MetadataColumns()
    cols.append_rows(metadatas, capacity=512)

    def python_oracle(md, flt):
        for key, value in flt.items():
            if value is None or (isinstance(value, list) and not value):
                continue
            values = value if isinstance(value, list) else [value]
            actual = md.get(key)
            if key == "year":
                if actual is None or int(actual) not in [int(v) for v in values]:
                    return False
            else:
                if actual is None or str(actual) not in [str(v) for v in values]:
                    return False
        return True

    fields = ["manufacturer", "model", "category", "year"]
    pools = {
        "manufacturer": ["宝马", "奔驰", "特斯拉", "保时捷"],
        "model": ["X5", "Model 3", "911"],
        "category": ["suv", "sedan"],
        "year": list(range(2014, 2027)),
    }
    for trial in range(50):
        flt = {}
        for field in fields:
            roll = rng.random()
            if roll < 0.4:
                continue
            pool = pools[field]
            if roll < 0.7:
                flt[field] = pool[rng.integers(len(pool))]
            else:
                size = 1 + int(rng.integers(3))
                flt[field] = [pool[rng.integers(len(pool))] for _ in range(size)]
        if not flt:
            flt = {"manufacturer": "宝马"}
        spec = compile_filter(flt, cols)
        mask = np.asarray(
            eval_filter_mask(jnp.asarray(cols.codes), jnp.asarray(cols.numerics), spec)
        )[: len(metadatas)]
        want = np.array([python_oracle(md, flt) for md in metadatas])
        np.testing.assert_array_equal(mask, want, err_msg=str(flt))


def test_year_range_dict_filter():
    """Explicit {gte, lte} range (reference Qdrant Range,
    vectorstore.py:252-262), incl. open ends and explicit nulls."""
    import numpy as np

    from automative_rag_tpu.documents import Document
    from automative_rag_tpu.index.flat import FlatIndex
    from automative_rag_tpu.index.filters import FilterError, compile_filter

    idx = FlatIndex(dim=8, device_dtype="float32")
    rng = np.random.default_rng(0)
    vectors = rng.normal(size=(6, 8)).astype(np.float32)
    docs = [Document(page_content=f"d{i}", metadata={"year": 2010 + i * 3})
            for i in range(6)]
    idx.add(vectors, docs)

    def years(flt):
        hits = idx.search(vectors[0], 6, flt)[0]
        return sorted(h.document.metadata["year"] for h in hits)

    assert years({"year": {"gte": 2016, "lte": 2022}}) == [2016, 2019, 2022]
    assert years({"year": {"gte": 2019}}) == [2019, 2022, 2025]
    assert years({"year": {"lte": 2013}}) == [2010, 2013]
    assert years({"year": {"gte": 2019, "lte": None}}) == [2019, 2022, 2025]

    import pytest as _pytest

    with _pytest.raises(FilterError):
        compile_filter({"year": {"between": (1, 2)}}, idx.columns)
    with _pytest.raises(FilterError):
        compile_filter({"manufacturer": {"gte": 1}}, idx.columns)
