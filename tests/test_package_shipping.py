"""ensure_package_on_workers: the zip must contain every engine module
(a missing submodule only fails at task time on a REAL cluster — the r7
local-cluster run found exactly that class of bug), and tune() must be
idempotent per SparkContext."""

import zipfile
from pathlib import Path

import cdc_application_febuary_spark as pkg
from cdc_application_febuary_spark.session import (
    _PKG_SHIPPED,
    _PKG_ZIP,
    ensure_package_on_workers,
)


def test_zip_covers_every_module(spark):
    ensure_package_on_workers(spark)
    zpath = _PKG_ZIP["pkg"]
    with zipfile.ZipFile(zpath) as z:
        shipped = set(z.namelist())
    pkg_dir = Path(pkg.__file__).resolve().parent
    expected = {
        pkg_dir.name + "/" + str(f.relative_to(pkg_dir))
        for f in pkg_dir.rglob("*.py")
    }
    missing = expected - shipped
    assert not missing, f"modules not shipped to executors: {sorted(missing)}"


def test_shipping_is_once_per_context(spark):
    ensure_package_on_workers(spark)
    app = spark.sparkContext.applicationId
    assert _PKG_SHIPPED.get(app) is True
    before = dict(_PKG_ZIP)
    ensure_package_on_workers(spark)  # no rebuild, no re-add
    assert _PKG_ZIP == before


def test_worker_tasks_can_import_engine(spark):
    ensure_package_on_workers(spark)

    def probe(_):
        import cdc_application_febuary_spark.operators.dedup  # noqa: F401

        return 1

    assert spark.sparkContext.parallelize(range(4), 4).map(probe).sum() == 4
