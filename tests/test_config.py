import json
import os

from diffusers_tpu.configuration_utils import ConfigMixin, register_to_config


class SampleObject(ConfigMixin):
    config_name = "config.json"

    @register_to_config
    def __init__(self, a=2, b=5, c=(2, 5), d="for diffusion", e=[1, 3]):
        pass


def test_register_to_config_defaults():
    obj = SampleObject()
    assert obj.config.a == 2
    assert obj.config.b == 5
    assert obj.config.c == (2, 5)


def test_register_to_config_positional_and_kwargs():
    obj = SampleObject(_name_or_path="lalala", c=6)
    assert obj.config.c == 6
    obj = SampleObject(10, c=6)
    assert obj.config.a == 10
    assert obj.config.c == 6


def test_save_load_roundtrip(tmp_path):
    obj = SampleObject(a=7, c=[1, 2])
    obj.save_config(tmp_path)
    with open(os.path.join(tmp_path, "config.json")) as f:
        raw = json.load(f)
    assert raw["_class_name"] == "SampleObject"
    assert raw["a"] == 7

    new_obj = SampleObject.from_config(SampleObject.load_config(tmp_path))
    assert new_obj.config.a == 7
    assert list(new_obj.config.c) == [1, 2]


def test_from_config_ignores_unknown_keys():
    config = {"a": 1, "zzz_unknown": True, "_class_name": "SampleObject"}
    obj = SampleObject.from_config(config)
    assert obj.config.a == 1


def test_config_attribute_passthrough():
    obj = SampleObject(a=3)
    assert obj.a == 3
