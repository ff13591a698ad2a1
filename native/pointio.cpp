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

// Exact farthest-point sampling over one cloud. pts is row-major
// [n_pts, stride] with xyz in the first 3 columns; writes n_out indices.
// Matches the reference's offline numpy FPS (dataset/ModelNetDataLoader.py:20-41
// lineage; mpa_tpu/data/modelnet.py:_fps_numpy) bit-for-bit: start at row 0,
// float32 min-distance table, first-occurrence argmax.
void pointio_fps(const float* pts, long n_pts, int stride, long n_out,
                 long* out_idx) {
    if (n_pts <= 0 || n_out <= 0) return;
    float* dist = (float*)malloc(n_pts * sizeof(float));
    if (!dist) return;
    for (long i = 0; i < n_pts; ++i) dist[i] = 1e30f;
    long far = 0;
    for (long i = 0; i < n_out; ++i) {
        out_idx[i] = far;
        const float fx = pts[far * stride + 0];
        const float fy = pts[far * stride + 1];
        const float fz = pts[far * stride + 2];
        long best = 0;
        float best_d = -1.0f;
        for (long j = 0; j < n_pts; ++j) {
            const float dx = pts[j * stride + 0] - fx;
            const float dy = pts[j * stride + 1] - fy;
            const float dz = pts[j * stride + 2] - fz;
            // Same association order as the numpy reduction: (dx2+dy2)+dz2.
            const float d = (dx * dx + dy * dy) + dz * dz;
            const float m = d < dist[j] ? d : dist[j];
            dist[j] = m;
            if (m > best_d) { best_d = m; best = j; }
        }
        far = best;
    }
    free(dist);
}

struct FpsJob {
    const float* pts;       // [n_clouds * max_pts * stride]
    const long* n_pts;      // [n_clouds] actual rows per cloud
    long* out_idx;          // [n_clouds * n_out]
    long n_clouds;
    long max_pts;
    int stride;
    long n_out;
    long next;
    pthread_mutex_t lock;
};

static void* fps_worker(void* arg) {
    FpsJob* job = (FpsJob*)arg;
    for (;;) {
        pthread_mutex_lock(&job->lock);
        long i = job->next++;
        pthread_mutex_unlock(&job->lock);
        if (i >= job->n_clouds) break;
        pointio_fps(job->pts + i * job->max_pts * job->stride, job->n_pts[i],
                    job->stride, job->n_out, job->out_idx + i * job->n_out);
    }
    return nullptr;
}

// FPS over a whole split in parallel (the ModelNet cache-build hot loop).
void pointio_fps_many(const float* pts, const long* n_pts, long n_clouds,
                      long max_pts, int stride, long n_out, long* out_idx,
                      int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > 64) n_threads = 64;
    FpsJob job = {pts, n_pts, out_idx, n_clouds, max_pts, stride, n_out, 0,
                  PTHREAD_MUTEX_INITIALIZER};
    pthread_t threads[64];
    for (int t = 0; t < n_threads; ++t)
        pthread_create(&threads[t], nullptr, fps_worker, &job);
    for (int t = 0; t < n_threads; ++t)
        pthread_join(threads[t], nullptr);
}

}  // extern "C"
