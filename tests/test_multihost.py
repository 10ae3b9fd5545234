"""Multi-host orchestration helpers: the per-host input partition must be
deterministic, disjoint, and complete for any host count."""

from ntcard_tpu.parallel.multihost import host_file_assignment


def test_assignment_partition():
    files = [f"f{i}.fq" for i in range(13)]
    sizes = [(i * 37) % 101 for i in range(13)]
    for n_hosts in (1, 2, 3, 8, 13, 20):
        slices = [host_file_assignment(files, sizes, n_hosts, h) for h in range(n_hosts)]
        flat = [f for s in slices for f in s]
        assert sorted(flat) == sorted(files)  # complete and disjoint
        # deterministic
        again = [host_file_assignment(files, sizes, n_hosts, h) for h in range(n_hosts)]
        assert slices == again


def test_assignment_balances_bytes():
    files = [f"f{i}" for i in range(16)]
    sizes = [2 ** (20 - i) for i in range(16)]  # heavily skewed
    parts = [host_file_assignment(files, sizes, 4, h) for h in range(4)]
    loads = [sum(sizes[files.index(f)] for f in p) for p in parts]
    # LPT guarantee: max load within 4/3 of the lower bound
    # max(largest file, total/num_hosts)
    opt_lb = max(max(sizes), sum(sizes) / 4)
    assert max(loads) <= 4 / 3 * opt_lb + 1
