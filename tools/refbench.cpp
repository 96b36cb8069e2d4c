// Measurement harness (driver-side tooling, not engine code): times the
// reference engine's ingest + range-scan workload at a configurable row
// count — the same shape as the committed performance test
// (/root/reference/examples/demo.cpp:100-153) so BENCH can compute
// bench_vs_baseline at more than one data size.
//
// Build (out-of-tree; never writes to /root/reference):
//   g++ -O2 -std=c++17 -I/root/reference/src \
//       /root/reference/src/*.cpp tools/refbench.cpp -o <out> -pthread
// Run: <out> <n_rows> <table_dir>
#include "merge_tree.h"
#include <chrono>
#include <iostream>
#include <random>
#include <string>

int main(int argc, char** argv) {
    size_t n = argc > 1 ? std::stoul(argv[1]) : 50000;
    std::string dir = argc > 2 ? argv[2] : "./refbench_data";

    clickhouse::MergeTreeConfig config;
    config.memtable_flush_threshold = 1000;
    config.max_parts = 10;
    config.enable_background_merge = true;
    config.merge_interval_seconds = 5;
    clickhouse::MergeTree engine(dir, config);

    std::mt19937 gen(42);
    size_t key_space = n < 50000 ? 10000 : n / 5;
    std::uniform_int_distribution<> key_dist(1, static_cast<int>(key_space));

    auto t0 = std::chrono::high_resolution_clock::now();
    for (size_t i = 0; i < n; i++) {
        engine.insert("key_" + std::to_string(key_dist(gen)),
                      "value_" + std::to_string(i),
                      static_cast<uint64_t>(i));
    }
    engine.flush_memtable();
    auto t1 = std::chrono::high_resolution_clock::now();
    auto ingest_ms =
        std::chrono::duration_cast<std::chrono::milliseconds>(t1 - t0).count();
    std::cout << "INGEST_MS " << ingest_ms << " ROWS " << n
              << " PARTS " << engine.part_count() << std::endl;

    auto q0 = std::chrono::high_resolution_clock::now();
    auto results = engine.query("key_1000", "key_2000");
    auto q1 = std::chrono::high_resolution_clock::now();
    auto query_us =
        std::chrono::duration_cast<std::chrono::microseconds>(q1 - q0).count();
    std::cout << "QUERY_US " << query_us << " RESULTS " << results.size()
              << std::endl;

    engine.shutdown();
    return 0;
}
