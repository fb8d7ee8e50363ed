"""Deployment helper: ship the plc package to executors.

On a real cluster the job is launched ``spark-submit --py-files plc.zip``
(BASELINE.json north_star); for interactive sessions and notebooks,
:func:`ensure_shipped` builds that zip on the fly and registers it with
``SparkContext.addPyFile`` so executor Python workers can unpickle the
mapInArrow closures. Idempotent per SparkContext.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

_shipped: set[str] = set()


def ensure_shipped(spark) -> None:
    sc = spark.sparkContext
    app_id = sc.applicationId
    if app_id in _shipped:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    if not os.path.isdir(pkg_dir):
        # plc was itself imported from a --py-files zip (spark-submit):
        # the archive is already on every executor's python path; trying
        # to re-zip from inside the archive would raise NotADirectoryError
        _shipped.add(app_id)
        return
    zpath = os.path.join(tempfile.gettempdir(), f"plc-pyfiles-{os.getpid()}.zip")
    if not os.path.exists(zpath):
        with zipfile.ZipFile(zpath, "w") as z:
            for fn in sorted(os.listdir(pkg_dir)):
                if fn.endswith(".py"):
                    z.write(os.path.join(pkg_dir, fn), arcname=f"plc/{fn}")
    sc.addPyFile(zpath)
    _shipped.add(app_id)
