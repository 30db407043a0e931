import textwrap

from iuvl_tpu.config import coerce_like, get_dotted, load_config


def _write(tmp_path, name, body):
    p = tmp_path / name
    p.write_text(textwrap.dedent(body))
    return str(p)


def test_stacked_yaml_merge(tmp_path):
    a = _write(
        tmp_path,
        "a.yaml",
        """
        MODEL:
          TEXT: {WIDTH: 512, LAYERS: 12}
        SOLVER: {BASE_LR: 0.0001}
        """,
    )
    b = _write(
        tmp_path,
        "b.yaml",
        """
        MODEL:
          TEXT: {LAYERS: 6}
        NEW_KEY: hello
        """,
    )
    cfg = load_config([a, b])
    assert cfg["MODEL"]["TEXT"]["WIDTH"] == 512  # kept from a
    assert cfg["MODEL"]["TEXT"]["LAYERS"] == 6  # overridden by b
    assert cfg["NEW_KEY"] == "hello"


def test_dotted_overrides_with_type_coercion(tmp_path):
    a = _write(
        tmp_path,
        "a.yaml",
        """
        SOLVER: {BASE_LR: 0.0001, MAX_NUM_EPOCHS: 10}
        WANDB: true
        """,
    )
    cfg = load_config(
        [a],
        overrides=[
            "SOLVER.BASE_LR", "0.01",
            "SOLVER.MAX_NUM_EPOCHS", "3",
            "WANDB", "false",
            "FRESH.NESTED", "7",
        ],
    )
    assert cfg["SOLVER"]["BASE_LR"] == 0.01
    assert cfg["SOLVER"]["MAX_NUM_EPOCHS"] == 3
    assert cfg["WANDB"] is False
    assert get_dotted(cfg, "FRESH.NESTED") == 7


def test_coerce_like_list():
    assert coerce_like([1, 2], "[3, 4]") == [3, 4]
