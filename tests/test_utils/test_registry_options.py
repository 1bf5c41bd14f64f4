import pytest

from basicsr4rs_tpu.utils.options import apply_force_yml, dict2str, yaml_load
from basicsr4rs_tpu.utils.registry import Registry


def test_registry_register_and_get():
    reg = Registry('test')

    @reg.register()
    class Foo:
        pass

    assert reg.get('Foo') is Foo
    assert 'Foo' in reg
    with pytest.raises(KeyError):
        reg.get('Missing')
    with pytest.raises(KeyError):
        reg.register(Foo)  # duplicate


def test_registry_suffix_fallback():
    reg = Registry('test')

    @reg.register(name='Bar_basicsr4rs_tpu')
    class Bar:
        pass

    assert reg.get('Bar') is Bar


def test_yaml_load_string_and_force_yml():
    opt = yaml_load("""
name: exp
train:
  ema_decay: 0.99
  lr: !!float 1e-4
nested:
  a:
    b: 1
""")
    assert opt['train']['lr'] == pytest.approx(1e-4)
    apply_force_yml(opt, ['train:ema_decay=0.999', 'nested:a:b=[1,2]', 'name=other'])
    assert opt['train']['ema_decay'] == 0.999
    assert opt['nested']['a']['b'] == [1, 2]
    assert opt['name'] == 'other'
    assert 'ema_decay' in dict2str(opt)
