"""Airflow DAG for the Spark engine — literal counterpart of the
reference's ``airflow/dags/reddit_pipeline.py:14-44`` (four BashOperators
in a linear chain, ``@daily``, retries=1 / 15 s), with each task shelling
to the engine CLI's staged daily pipeline instead of the reference's
four scripts:

    extract_reddit    -> python -m reddit_etl_pipeline_spark daily --stage extract
    load_to_lake      -> ...                                       --stage load
    load_to_warehouse -> ...                                       --stage upsert
    run_models        -> ...                                       --stage models

Stages communicate through files keyed by ``{{ ds_nodash }}`` (the
date-stamped day CSV, then the lake partition) exactly like the
reference's daily CSVs, so every task is independently retryable —
the reason to run the DAG instead of the one-program
``daily --stage all``.

Paths come from environment variables so the file deploys unedited:
REDDIT_SPARK_LAKE / REDDIT_SPARK_WAREHOUSE / REDDIT_SPARK_CONF.
The source is chosen EXPLICITLY: set REDDIT_SPARK_CONF to the
configuration.conf path for the live API, or set
REDDIT_SPARK_FAKE_SOURCE=<n> to opt into the offline deterministic
fake source (CI / demo deploys). If NEITHER is set the DAG raises at
parse time — a production deploy missing the conf var must fail loudly,
not silently ingest synthetic posts into the real lake with green task
status. The package must be importable from the worker shell: install
it, or export PYTHONPATH=<repo root> in the Airflow worker environment.
"""

from __future__ import annotations

import os
from datetime import datetime, timedelta

# Source selection runs BEFORE the airflow imports so the fail-loud
# contract is unit-testable without an airflow install.
LAKE = os.environ.get("REDDIT_SPARK_LAKE", "/data/reddit/lake")
WAREHOUSE = os.environ.get("REDDIT_SPARK_WAREHOUSE", "/data/reddit/warehouse")
CONF = os.environ.get("REDDIT_SPARK_CONF", "")
FAKE = os.environ.get("REDDIT_SPARK_FAKE_SOURCE", "")

if CONF:
    _CONF_FLAG = f" --conf {CONF}"
elif FAKE:
    # validate here, not via a bare int() crash: a malformed or
    # non-positive value must fail with the env contract spelled out,
    # and FAKE_SOURCE=0 must not schedule a green zero-post ingest
    if not FAKE.isdigit() or int(FAKE) <= 0:
        raise ValueError(
            "reddit_pipeline_spark DAG: REDDIT_SPARK_FAKE_SOURCE must be "
            f"a positive integer post count, got {FAKE!r}."
        )
    _CONF_FLAG = f" --fake-source {int(FAKE)}"
else:
    raise ValueError(
        "reddit_pipeline_spark DAG: set REDDIT_SPARK_CONF (live API conf "
        "path) or REDDIT_SPARK_FAKE_SOURCE=<n posts> (explicit offline "
        "opt-in); refusing to default to the synthetic source."
    )

from airflow import DAG  # noqa: E402
from airflow.operators.bash import BashOperator  # noqa: E402
_BASE = (
    "python -m reddit_etl_pipeline_spark daily"
    f" --lake {LAKE} --warehouse {WAREHOUSE}{_CONF_FLAG}"
    " --date {{ ds_nodash }} --stage "
)

default_args = {
    "owner": "airflow",
    "depends_on_past": False,
    "start_date": datetime(2025, 3, 24),
    "email_on_failure": False,
    "retries": 1,
    "retry_delay": timedelta(seconds=15),
}

dag = DAG(
    "reddit_analytics_pipeline_spark",
    default_args=default_args,
    schedule="@daily",
)

extract_reddit = BashOperator(
    task_id="extract_reddit",
    bash_command=_BASE + "extract",
    dag=dag,
)

load_to_lake = BashOperator(
    task_id="load_to_lake",
    bash_command=_BASE + "load",
    dag=dag,
)

load_to_warehouse = BashOperator(
    task_id="load_to_warehouse",
    bash_command=_BASE + "upsert",
    dag=dag,
)

run_models = BashOperator(
    task_id="run_models",
    bash_command=_BASE + "models",
    dag=dag,
)

extract_reddit >> load_to_lake >> load_to_warehouse >> run_models
