"""ensure_libtpu_flags: idempotent, append-only, user value wins."""

import os

from cbinfer_tpu import tpu_env


def test_appends_when_unset(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    v = tpu_env.ensure_libtpu_flags()
    assert "--xla_msa_max_outstanding_prefetches=0" in v.split()
    assert os.environ["LIBTPU_INIT_ARGS"] == v


def test_idempotent(monkeypatch):
    monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
    v1 = tpu_env.ensure_libtpu_flags()
    v2 = tpu_env.ensure_libtpu_flags()
    assert v1 == v2


def test_preserves_other_flags(monkeypatch):
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--xla_foo=1")
    v = tpu_env.ensure_libtpu_flags()
    assert "--xla_foo=1" in v.split()
    assert "--xla_msa_max_outstanding_prefetches=0" in v.split()


def test_user_pin_wins(monkeypatch):
    monkeypatch.setenv("LIBTPU_INIT_ARGS",
                       "--xla_msa_max_outstanding_prefetches=4")
    v = tpu_env.ensure_libtpu_flags()
    assert v.split().count("--xla_msa_max_outstanding_prefetches=4") == 1
    assert "--xla_msa_max_outstanding_prefetches=0" not in v.split()
