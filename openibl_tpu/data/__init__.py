"""Dataset registry mirroring the reference factory
(/root/reference/ibl/datasets/__init__.py:18-31) plus a hermetic synthetic
dataset for tests/benchmarks."""


def names():
    return ["pitts", "tokyo", "demo", "synthetic"]


def create(name, root, *args, **kwargs):
    if name == "pitts":
        from openibl_tpu.data.pitts import Pittsburgh

        return Pittsburgh(root, *args, **kwargs)
    if name == "tokyo":
        from openibl_tpu.data.tokyo import Tokyo

        return Tokyo(root, *args, **kwargs)
    if name == "demo":
        from openibl_tpu.data.demo import Demo

        return Demo(root, *args, **kwargs)
    if name == "synthetic":
        from openibl_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(root, *args, **kwargs)
    raise KeyError(f"Unknown dataset: {name}")
