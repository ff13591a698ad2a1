// pointio — fast point-cloud text parsing for the data layer.
//
// The reference loads ShapeNetPart/ModelNet as per-shape whitespace/comma
// text files through np.loadtxt inside DataLoader workers
// (dataset/ShapeNetDataLoader.py:100-144, dataset/ModelNetDataLoader.py:44-132)
// — the dominant ingest cost. This native reader mmap-free bulk-reads each
// file and parses floats with a tight strtof loop, with a pthread pool for
// whole-split loading. Exposed to Python via ctypes (mpa_tpu/data/native_io.py).

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <pthread.h>

extern "C" {

// Parse one text file of `n_cols` numeric columns (whitespace or comma
// separated). Writes up to max_rows * n_cols floats into out (row-major).
// Returns the number of rows parsed, or -1 on open failure.
long pointio_parse_file(const char* path, float* out, long max_rows, int n_cols) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    fseek(f, 0, SEEK_END);
    long size = ftell(f);
    fseek(f, 0, SEEK_SET);
    char* buf = (char*)malloc(size + 1);
    if (!buf) { fclose(f); return -1; }
    size = (long)fread(buf, 1, size, f);
    buf[size] = '\0';
    fclose(f);

    long rows = 0;
    char* p = buf;
    char* end = buf + size;
    while (p < end && rows < max_rows) {
        // Skip leading whitespace / newlines / commas.
        while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r' || *p == ','))
            ++p;
        if (p >= end) break;
        int col = 0;
        for (; col < n_cols; ++col) {
            char* next;
            float v = strtof(p, &next);
            if (next == p) break;  // malformed tail
            out[rows * n_cols + col] = v;
            p = next;
            while (p < end && (*p == ' ' || *p == '\t' || *p == ','))
                ++p;
        }
        if (col == n_cols) ++rows;
        // Advance to next line on partial rows.
        while (p < end && *p != '\n') ++p;
    }
    free(buf);
    return rows;
}

struct Job {
    const char* const* paths;
    float* out;          // [n_files * max_rows * n_cols]
    long* row_counts;    // [n_files]
    long n_files;
    long max_rows;
    int n_cols;
    long next;           // work index
    pthread_mutex_t lock;
};

static void* worker(void* arg) {
    Job* job = (Job*)arg;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        long i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n_files) break;
        job->row_counts[i] = pointio_parse_file(
            job->paths[i], job->out + i * job->max_rows * job->n_cols,
            job->max_rows, job->n_cols);
    }
    return nullptr;
}

// Parse many files in parallel. out must hold n_files*max_rows*n_cols floats;
// row_counts receives per-file row counts (-1 on failure).
void pointio_parse_many(const char* const* paths, long n_files, float* out,
                        long* row_counts, long max_rows, int n_cols,
                        int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    Job job = {paths, out, row_counts, n_files, max_rows, n_cols, 0,
               PTHREAD_MUTEX_INITIALIZER};
    pthread_t threads[64];
    for (int t = 0; t < n_threads; ++t)
        pthread_create(&threads[t], nullptr, worker, &job);
    for (int t = 0; t < n_threads; ++t)
        pthread_join(threads[t], nullptr);
}

}  // extern "C"
