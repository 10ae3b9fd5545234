"""ThreadSanitizer pass over the native threaded entry points (SURVEY.md §5
race detection; reference analog: the OpenMP atomics of ntcard.cpp:132-145).

Builds packer.cpp into a TSan-instrumented executable whose main hammers the
three threaded regions — the shared uint16 count table updated with relaxed
atomics (ntcard_host_update), the thread-private HLL sketches + max-merge
(ntcard_host_hll_update), and the per-thread-local histogram scan
(ntcard_hist_u16) — with maximal contention (s_bits=1 samples ~75% of
windows). Any data race halts with exit 66.
"""

import shutil
import subprocess
import sys
from pathlib import Path

import pytest

SRC = Path(__file__).resolve().parents[1] / "ntcard_tpu" / "native" / "packer.cpp"

DRIVER = r"""
#include <cstdint>
#include <vector>
extern "C" {
void ntcard_host_update(const uint8_t*, long long, long long, long long,
                        const int32_t*, int, int, int, const int32_t*, int,
                        uint16_t*, long long*, int);
void ntcard_host_hll_update(const uint8_t*, long long, long long, long long,
                            int, int, uint8_t*, int);
void ntcard_hist_u16(const int32_t*, long long, long long*);
}
int main() {
  const long long rows = 64, row_len = 256, stride = 224;
  std::vector<uint8_t> codes(rows * row_len);
  unsigned s = 12345;
  for (auto& c : codes) {
    s = s * 1103515245u + 12345u;
    c = ((s >> 16) % 23 == 0) ? 4 : ((s >> 16) & 3);
  }
  int32_t ks[2] = {21, 33};
  // s_bits=1 samples ~75% of windows; a tiny r_bits concentrates the
  // atomic increments on few buckets -> maximal write contention
  const int s_bits = 1, r_bits = 6;
  std::vector<uint16_t> table(2ull * 2 * (1 << r_bits), 0);
  long long f1[2] = {0, 0};
  for (int it = 0; it < 4; it++)
    ntcard_host_update(codes.data(), rows, row_len, stride, ks, 2, s_bits,
                       r_bits, nullptr, 0, table.data(), f1, 4);
  std::vector<uint8_t> regs(1 << 10, 0);
  for (int it = 0; it < 4; it++)
    ntcard_host_hll_update(codes.data(), rows, row_len, stride, 25, 10,
                           regs.data(), 4);
  std::vector<int32_t> t32(1 << 18);
  for (unsigned long i = 0; i < t32.size(); i++) t32[i] = (int32_t)(i * 2654435761u);
  std::vector<long long> hist(65536, 0);
  ntcard_hist_u16(t32.data(), (long long)t32.size(), hist.data());
  long long total = 0;
  for (auto v : hist) total += v;
  return (f1[0] > 0 && f1[1] > 0 && total == (long long)t32.size()) ? 0 : 1;
}
"""


@pytest.mark.skipif(shutil.which("g++") is None, reason="g++ unavailable")
def test_tsan_clean(tmp_path):
    drv = tmp_path / "tsan_driver.cpp"
    drv.write_text(DRIVER)
    exe = tmp_path / "tsan_test"
    build = subprocess.run(
        ["g++", "-fsanitize=thread", "-O1", "-g", "-std=c++17",
         str(SRC), str(drv), "-o", str(exe), "-lpthread"],
        capture_output=True, text=True, timeout=300,
    )
    err = (build.stderr or "").lower()
    if build.returncode != 0 and "cannot find" in err and "tsan" in err:
        pytest.skip(f"TSan runtime unavailable: {build.stderr.splitlines()[-1]}")
    assert build.returncode == 0, build.stderr
    r = subprocess.run(
        [str(exe)], capture_output=True, text=True, timeout=300,
        env={"TSAN_OPTIONS": "halt_on_error=1 exitcode=66", "PATH": "/usr/bin:/bin"},
    )
    assert "ThreadSanitizer" not in r.stderr, r.stderr
    assert r.returncode == 0, f"exit {r.returncode}\n{r.stderr}"


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
