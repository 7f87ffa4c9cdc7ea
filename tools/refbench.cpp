// Measures the reference hot-loop's per-component cost: t = X r; tt; p = X^T t
// (the exact operations at /root/reference/src/pls.cpp:418-421) with Eigen,
// single-threaded double precision, as the CPU baseline for bench.py.
#include <Eigen/Dense>
#include <chrono>
#include <iostream>
int main(int argc, char** argv) {
    int N = argc > 1 ? atoi(argv[1]) : 20000;
    int K = argc > 2 ? atoi(argv[2]) : 2000;
    Eigen::MatrixXd X = Eigen::MatrixXd::Random(N, K);
    Eigen::VectorXd r = Eigen::VectorXd::Random(K);
    // warmup
    Eigen::VectorXd t = X * r;
    double tt = t.dot(t);
    Eigen::VectorXd p = X.transpose() * t;
    auto t0 = std::chrono::steady_clock::now();
    int iters = 10;
    double acc = 0;
    for (int i = 0; i < iters; i++) {
        t.noalias() = X * r;
        tt = t.dot(t);
        p.noalias() = X.transpose() * t;
        acc += p(0) + tt;
    }
    auto t1 = std::chrono::steady_clock::now();
    double sec = std::chrono::duration<double>(t1 - t0).count() / iters;
    double bytes = double(N) * K * 8;  // one logical pass of X per component
    std::cout << "N=" << N << " K=" << K << " sec/component=" << sec
              << " one-pass-GB/s=" << bytes / sec / 1e9 << " (sink " << acc
              << ")\n";
}
