"""configuration.conf parity (reddit_etl_pipeline_spark/config.py vs
reference airflow/extraction/{extract-from-reddit,upload_to_s3}.py)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from reddit_etl_pipeline_spark.config import PipelineConfig, load_config  # noqa: E402

SAMPLE = """
[reddit_config]
secret = SECRET123
client_id = CLIENT456

[aws_config]
bucket_name = my-reddit-lake
aws_region = us-east-1
aws_access_key_id = AKIATEST
aws_secret_access_key = shhh
redshift_username = awsuser
redshift_password = pw
redshift_hostname = example.cluster.redshift.amazonaws.com
redshift_port = 5439
redshift_role = RedShiftLoadRole
redshift_database = dev
account_id = 123456789012
"""


@pytest.fixture()
def conf_path(tmp_path):
    p = tmp_path / "configuration.conf"
    p.write_text(SAMPLE)
    return str(p)


def test_reads_reference_sections_and_keys(conf_path):
    cfg = load_config(conf_path)
    assert cfg.client_id == "CLIENT456"
    assert cfg.secret == "SECRET123"
    assert cfg.bucket_name == "my-reddit-lake"
    assert cfg.aws_region == "us-east-1"
    # redshift keys aren't consumed (Spark is the warehouse) but survive
    assert cfg.extras["aws_config.redshift_role"] == "RedShiftLoadRole"
    assert cfg.extras["aws_config.account_id"] == "123456789012"


def test_lake_root_and_s3_conf(conf_path):
    cfg = load_config(conf_path)
    assert cfg.lake_root() == "s3a://my-reddit-lake/lake"
    assert cfg.lake_root("raw") == "s3a://my-reddit-lake/raw"
    conf = cfg.spark_s3_conf()
    assert conf["spark.hadoop.fs.s3a.access.key"] == "AKIATEST"
    assert conf["spark.hadoop.fs.s3a.endpoint.region"] == "us-east-1"


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        load_config(str(tmp_path / "nope.conf"))


def test_minimal_conf_degrades_to_none(tmp_path):
    p = tmp_path / "c.conf"
    p.write_text("[reddit_config]\nclient_id = x\nsecret = y\n")
    cfg = load_config(str(p))
    assert cfg.client_id == "x" and cfg.bucket_name is None
    with pytest.raises(ValueError):
        cfg.lake_root()
    assert cfg.spark_s3_conf() == {}


def test_reference_shipped_conf_is_empty_but_loads():
    """The reference ships an empty configuration.conf (credentials not
    committed); parity means loading it yields an all-None config, not a
    crash."""
    ref = "/root/reference/airflow/extraction/configuration.conf"
    if not os.path.exists(ref):
        pytest.skip("reference conf not present")
    cfg = load_config(ref)
    assert isinstance(cfg, PipelineConfig)
    assert cfg.client_id is None and cfg.bucket_name is None
