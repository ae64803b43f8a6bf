#!/bin/bash
# Build the reference baryonyx (read-only at /root/reference) out-of-tree for
# the head-to-head harness (scripts/head_to_head.py).
#
# The reference is 2020-era C++ written against fmt 6 with git-submodule
# externals that are not vendored in this image, so the copy in /tmp gets:
#   1. fmt 8.1.1 headers grafted from TensorFlow's bundled copy, with
#      FMT_CONSTEVAL disabled (the logging wrappers pass runtime format
#      strings) and `const` added to the enum formatter methods
#      (core-out/result.hpp/problem.hpp) per the fmt 8 formatter contract;
#   2. <cassert> included in app/src/main.cpp (older toolchains pulled it in
#      transitively) and static_cast<int> on a few enum fmt::print args for
#      enums that never had formatter specializations;
#   3. a measurement shim: an atomic (sweeps, rows-updated) counter in
#      compute_order::run / push_and_run (lib/src/itm-common.hpp:800-880 /
#      :683), dumped to stderr at exit when BX_SWEEP_COUNT is set. This is
#      what turns the reference into a measurable baseline: aggregate
#      sweeps/s across its optimizer threads, and full-problem-equivalent
#      sweeps/s (rows updated / m).
#
# None of this changes solver behavior (counters are relaxed atomics on the
# per-sweep boundary, not per element).
#
# Output binary: /tmp/bxref/build/app/baryonyx-0.5
set -euo pipefail

SRC=/tmp/bxref/src
BUILD=/tmp/bxref/build
FMT_INC=/opt/venv/lib/python3.12/site-packages/tensorflow/include/external/fmt/include

if [[ -x $BUILD/app/baryonyx-0.5 && "${1:-}" != "--force" ]]; then
    echo "reference already built: $BUILD/app/baryonyx-0.5"
    exit 0
fi

rm -rf /tmp/bxref
mkdir -p /tmp/bxref
cp -r /root/reference "$SRC"
chmod -R u+w "$SRC"
mkdir -p "$SRC/external/fmt" "$SRC/external/ut/include"
cp -r "$FMT_INC" "$SRC/external/fmt/"

# --- fmt 8 compatibility -----------------------------------------------------
grep -rl "FormatContext& ctx)" "$SRC/lib" "$SRC/app" | while read -r f; do
    sed -i 's/FormatContext& ctx)$/FormatContext\& ctx) const/' "$f"
done
sed -i 's/#include <cstring>/#include <cstring>\n#include <cassert>/' \
    "$SRC/app/src/main.cpp"
python3 - "$SRC" <<'EOF'
import sys
src = sys.argv[1]
for p in (f"{src}/app/src/main.cpp", f"{src}/app/src/benchmark.cpp"):
    s = open(p).read()
    s = s.replace("e.failure());", "static_cast<int>(e.failure()));")
    s = s.replace('"solver error: {}\\n", e.failure())',
                  '"solver error: {}\\n", static_cast<int>(e.failure()))')
    s = s.replace("dirname + filename, rawpb.status);",
                  "dirname + filename, static_cast<int>(rawpb.status));")
    open(p, "w").write(s)
EOF

# --- sweep counter shim ------------------------------------------------------
python3 - "$SRC" <<'EOF'
import sys
src = sys.argv[1]
p = f"{src}/lib/src/itm-common.hpp"
s = open(p).read()

shim = '''
// head-to-head measurement shim (see scripts/build_reference.sh): counts
// inner sweeps and rows updated across all optimizer threads; dumped at
// process exit when BX_SWEEP_COUNT is set.
struct bx_sweep_counters
{
    std::atomic<long long> sweeps{ 0 };
    std::atomic<long long> rows{ 0 };
    ~bx_sweep_counters()
    {
        if (std::getenv("BX_SWEEP_COUNT"))
            std::fprintf(stderr,
                         "BX_SWEEPS %lld BX_ROWS %lld\\n",
                         sweeps.load(),
                         rows.load());
    }
};
inline bx_sweep_counters bx_counters;
'''

anchor = "struct compute_order"
assert anchor in s, "compute_order anchor not found"
s = s.replace(anchor, shim + "\n" + anchor, 1)

# count in run(): one sweep, R.size() rows
run_anchor = """    {
        bool pi_changed = false;
        int remaining = 0;
"""
assert run_anchor in s
s = s.replace(run_anchor, run_anchor + """
        bx_counters.sweeps.fetch_add(1, std::memory_order_relaxed);
        bx_counters.rows.fetch_add(static_cast<long long>(R.size()),
                                   std::memory_order_relaxed);
""", 1)

# count push_and_run() sweeps too (same row pass with amplified costs)
pr = s.find("int push_and_run(")
body = s.find("{", s.find(")", pr))
s = s[: body + 1] + """
        bx_counters.sweeps.fetch_add(1, std::memory_order_relaxed);
        bx_counters.rows.fetch_add(static_cast<long long>(R.size()),
                                   std::memory_order_relaxed);
""" + s[body + 1 :]

if "#include <cstdio>" not in s:
    s = s.replace("#include <atomic>", "#include <atomic>\n#include <cstdio>\n#include <cstdlib>", 1) \
        if "#include <atomic>" in s else s
open(p, "w").write(s)

# make sure the needed headers exist
need = ["atomic", "cstdio", "cstdlib"]
have = [f"#include <{h}>" in s for h in need]
if not all(have):
    lines = s.splitlines()
    for i, l in enumerate(lines):
        if l.startswith("#include"):
            ins = i
            break
    add = [f"#include <{h}>" for h, ok in zip(need, have) if not ok]
    lines[ins:ins] = add
    open(p, "w").write("\n".join(lines))
EOF

cmake -S "$SRC" -B "$BUILD" -DCMAKE_BUILD_TYPE=Release -G Ninja \
    -DCMAKE_CXX_FLAGS="-DFMT_CONSTEVAL= -w" > /dev/null
cmake --build "$BUILD" -j"$(nproc)" --target baryonyx-0.5
echo "built: $BUILD/app/baryonyx-0.5"
