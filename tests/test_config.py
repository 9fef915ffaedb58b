import os

import pytest

from audiogpt_tpu.config import Config, load_config
from audiogpt_tpu.registry import Registry


class TestConfig:
    def test_immutable(self):
        c = Config(a=1, b={"c": 2})
        with pytest.raises(TypeError):
            c.a = 5
        assert c.a == 1 and c.b["c"] == 2 and c["b"]["c"] == 2

    def test_replace_and_merge(self):
        c = Config(a=1, b={"c": 2, "d": 3})
        c2 = c.updated({"b": {"c": 9}})
        assert c2.b["c"] == 9 and c2.b["d"] == 3 and c.b["c"] == 2

    def test_override_clauses(self):
        c = Config(a=1, b={"c": 2}, lst=[1])
        c2 = c.override("a=5,b.c=7,lst=[1, 2, 3],name=foo,flag=true")
        assert c2.a == 5 and c2.b["c"] == 7
        assert list(c2.lst) == [1, 2, 3]
        assert c2.name == "foo" and c2.flag is True

    def test_hashable(self):
        assert hash(Config(a=1)) == hash(Config(a=1))
        assert Config(a=1) == Config(a=1)

    def test_yaml_inheritance(self, tmp_path):
        (tmp_path / "base.yaml").write_text("a: 1\nb: {c: 2, d: 3}\n")
        (tmp_path / "mid.yaml").write_text(
            "base_config: base.yaml\nb: {c: 5}\ne: 6\n"
        )
        (tmp_path / "leaf.yaml").write_text(
            "base_config: [mid.yaml]\na: 9\n"
        )
        c = load_config(str(tmp_path / "leaf.yaml"))
        assert c.a == 9 and c.b["c"] == 5 and c.b["d"] == 3 and c.e == 6
        assert "base_config" not in c

    def test_inheritance_cycle_raises(self, tmp_path):
        (tmp_path / "x.yaml").write_text("base_config: y.yaml\n")
        (tmp_path / "y.yaml").write_text("base_config: x.yaml\n")
        with pytest.raises(ValueError):
            load_config(str(tmp_path / "x.yaml"))

    def test_save_roundtrip(self, tmp_path):
        c = Config(a=1, b={"c": [1, 2]})
        p = os.path.join(tmp_path, "cfg.yaml")
        c.save(p)
        assert load_config(p) == c


class TestRegistry:
    def test_register_and_get(self):
        r = Registry("thing")

        @r.register("foo")
        class Foo:
            pass

        assert r.get("FOO") is Foo
        assert "foo" in r
        with pytest.raises(KeyError):
            r.get("bar")

    def test_duplicate_raises(self):
        r = Registry("thing")
        r.register("x")(object())
        with pytest.raises(KeyError):
            r.register("x")(object())
