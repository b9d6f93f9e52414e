import pytest

from lightfusion_spark.operators import privacy


@pytest.fixture(scope="module")
def people(spark):
    # zip/age classes: (z1,30)x3 with 2 diseases, (z1,40)x1, (z2,30)x2
    # with 1 disease
    rows = [
        ("z1", 30, "flu"),
        ("z1", 30, "flu"),
        ("z1", 30, "cold"),
        ("z1", 40, "flu"),
        ("z2", 30, "cold"),
        ("z2", 30, "cold"),
    ]
    return spark.createDataFrame(rows, "zip string, age int, disease string")


def test_k_anonymity_counts(people):
    rep = privacy.k_anonymity_report(
        people, ["zip", "age"], k=3, sensitive_col="disease"
    ).first()
    assert rep["n_rows"] == 6
    assert rep["n_classes"] == 3
    assert rep["min_class_size"] == 1
    # classes smaller than 3: (z1,40) size 1 + (z2,30) size 2 -> 3 rows
    assert rep["n_rows_at_risk"] == 3
    assert rep["risk_ppm"] == 500_000
    # l-diversity: (z1,40) and (z2,30) are homogeneous (1 disease)
    assert rep["min_l"] == 1
    assert rep["n_rows_homogeneous"] == 3


def test_k_anonymity_without_sensitive(people):
    rep = privacy.k_anonymity_report(people, ["zip"], k=2).first()
    assert rep["n_classes"] == 2
    assert rep["n_rows_at_risk"] == 0
    assert rep["risk_ppm"] == 0
    assert "min_l" not in rep.asDict()


def test_null_quasi_values_form_their_own_class(spark):
    df = spark.createDataFrame(
        [(None, "a"), (None, "b"), ("z", "c")], "zip string, disease string"
    )
    rep = privacy.k_anonymity_report(
        df, ["zip"], k=2, sensitive_col="disease"
    ).first()
    assert rep["n_classes"] == 2
    assert rep["n_rows_at_risk"] == 1  # the z-class of size 1


def test_guards(people):
    with pytest.raises(ValueError, match="quasi"):
        privacy.k_anonymity_report(people, [], k=3)
    with pytest.raises(ValueError, match="k must"):
        privacy.k_anonymity_report(people, ["zip"], k=1)
