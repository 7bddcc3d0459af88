"""Configuration-file parity with the reference pipeline.

The reference reads a ``configuration.conf`` INI next to each script
(reference ``airflow/extraction/extract-from-reddit.py:21-32`` →
``config.get("reddit_config", ...)`` at ``:202-205``;
``upload_to_s3.py:25-38`` and ``s3_to_redshift.py:36-43`` →
``parser.get("aws_config", ...)``). This module reads the same file
shape and surfaces the same keys, so a reference user can point their
existing conf at this engine unchanged.

Spark-first mapping: Redshift connection keys are accepted (and
preserved in ``extras``) but unused — Spark *is* the warehouse; the
bucket/region keys become the ``s3a://`` lake root that
``sources/lake.py`` writes natively, replacing the reference's separate
upload + COPY hops.
"""

from __future__ import annotations

import configparser
import os
from dataclasses import dataclass, field

REDDIT_SECTION = "reddit_config"  # extract-from-reddit.py:204-205
AWS_SECTION = "aws_config"  # upload_to_s3.py:35-38, s3_to_redshift.py:36-43


@dataclass(frozen=True)
class PipelineConfig:
    """Typed view of the reference's configuration.conf."""

    client_id: str | None = None
    secret: str | None = None
    bucket_name: str | None = None
    aws_region: str | None = None
    aws_access_key_id: str | None = None
    aws_secret_access_key: str | None = None
    extras: dict = field(default_factory=dict)

    def lake_root(self, prefix: str = "lake") -> str:
        """``s3a://bucket/prefix`` lake root for sources/lake.write_table —
        Spark writes the object store directly (no upload hop)."""
        if not self.bucket_name:
            raise ValueError("bucket_name not configured ([aws_config])")
        return f"s3a://{self.bucket_name}/{prefix}"

    def spark_s3_conf(self) -> dict:
        """Hadoop-S3A session conf for the configured credentials/region
        (apply via get_spark(extra_conf=...)). Empty when credentials are
        absent (instance-profile / anonymous access)."""
        conf = {}
        if self.aws_access_key_id:
            conf["spark.hadoop.fs.s3a.access.key"] = self.aws_access_key_id
        if self.aws_secret_access_key:
            conf["spark.hadoop.fs.s3a.secret.key"] = self.aws_secret_access_key
        if self.aws_region:
            conf["spark.hadoop.fs.s3a.endpoint.region"] = self.aws_region
        return conf


def load_config(path: str) -> PipelineConfig:
    """Parse a reference-shaped configuration.conf.

    Missing file raises FileNotFoundError (parity:
    extract-from-reddit.py:27-29); missing sections/keys degrade to None
    so a minimal conf (e.g. only [reddit_config]) still loads. Keys this
    engine doesn't consume (the redshift_* connection set, account_id)
    are preserved verbatim in ``extras``.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(f"Configuration file not found: {path}")
    parser = configparser.ConfigParser()
    parser.read(path)

    def get(section: str, key: str) -> str | None:
        return parser.get(section, key, fallback=None)

    known = {
        (REDDIT_SECTION, "client_id"),
        (REDDIT_SECTION, "secret"),
        (AWS_SECTION, "bucket_name"),
        (AWS_SECTION, "aws_region"),
        (AWS_SECTION, "aws_access_key_id"),
        (AWS_SECTION, "aws_secret_access_key"),
    }
    extras = {
        f"{section}.{key}": parser.get(section, key)
        for section in parser.sections()
        for key in parser[section]
        if (section, key) not in known
    }
    return PipelineConfig(
        client_id=get(REDDIT_SECTION, "client_id"),
        secret=get(REDDIT_SECTION, "secret"),
        bucket_name=get(AWS_SECTION, "bucket_name"),
        aws_region=get(AWS_SECTION, "aws_region"),
        aws_access_key_id=get(AWS_SECTION, "aws_access_key_id"),
        aws_secret_access_key=get(AWS_SECTION, "aws_secret_access_key"),
        extras=extras,
    )
