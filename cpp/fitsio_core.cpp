// Native FITS image reader core (host runtime component).
//
// The reference's I/O stack leans on astropy's C FITS machinery plus
// ndmap_proxy partial reads (pixell/enmap.py:3139-3233). This is the
// TPU-framework equivalent: a small C++ core that parses FITS headers and
// reads rectangular pixel boxes straight off disk with pread (no full-map
// load), with OpenMP-threaded row reads and endian conversion. Exposed to
// python via ctypes (pixell_tpu/fits_io.py uses it when available).
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <unistd.h>
#include <sys/stat.h>

extern "C" {

static const long BLOCK = 2880;

// Parse headers of HDU `hdu`, returning:
//  data_offset (bytes), bitpix, naxis, dims[8] (fits order), and the raw
//  header text (caller-allocated buffer). Returns 0 on success.
int fits_open_info(const char* fname, int hdu, long* data_offset, int* bitpix,
                   int* naxis, long* dims, char* header_buf, long header_cap,
                   long* header_len) {
    int fd = open(fname, O_RDONLY);
    if (fd < 0) return -1;
    long off = 0;
    int cur = 0;
    char block[BLOCK];
    *header_len = 0;
    while (1) {
        // read this HDU's header blocks
        long hstart = off;
        int bp = 0, nax = 0;
        long dd[9] = {0,0,0,0,0,0,0,0,0};
        bool done = false;
        long hlen = 0;
        while (!done) {
            ssize_t n = pread(fd, block, BLOCK, off);
            if (n < BLOCK) { close(fd); return -2; }
            off += BLOCK;
            for (int i = 0; i < BLOCK; i += 80) {
                char* card = block + i;
                if (cur == hdu && header_buf && hlen + 80 <= header_cap) {
                    memcpy(header_buf + hlen, card, 80);
                    hlen += 80;
                }
                if (strncmp(card, "END", 3) == 0 &&
                    (card[3] == ' ' || card[3] == '\0')) { done = true; break; }
                if (strncmp(card, "BITPIX  =", 9) == 0) bp = atoi(card + 9);
                if (strncmp(card, "NAXIS   =", 9) == 0) nax = atoi(card + 9);
                if (strncmp(card, "NAXIS", 5) == 0 && card[5] >= '1' && card[5] <= '8'
                    && card[8] == '=') {
                    int ax = card[5] - '0';
                    dd[ax] = atol(card + 9);
                }
            }
        }
        long dsize = 0;
        if (nax > 0) {
            dsize = labs((long)bp)/8;
            for (int a = 1; a <= nax; a++) dsize *= dd[a];
            dsize = (dsize + BLOCK - 1)/BLOCK*BLOCK;
        }
        if (cur == hdu) {
            *data_offset = off;
            *bitpix = bp;
            *naxis = nax;
            for (int a = 0; a < nax && a < 8; a++) dims[a] = dd[a+1];
            *header_len = hlen;
            close(fd);
            return 0;
        }
        off += dsize;
        cur++;
        struct stat st;
        if (fstat(fd, &st) == 0 && off >= st.st_size) { close(fd); return -3; }
    }
}

static void byteswap(unsigned char* p, long n, int width) {
    if (width == 2) {
        for (long i = 0; i < n; i++) {
            unsigned char* q = p + i*2;
            unsigned char t = q[0]; q[0] = q[1]; q[1] = t;
        }
    } else if (width == 4) {
        for (long i = 0; i < n; i++) {
            unsigned char* q = p + i*4;
            unsigned char t0 = q[0], t1 = q[1];
            q[0] = q[3]; q[1] = q[2]; q[2] = t1; q[3] = t0;
        }
    } else if (width == 8) {
        for (long i = 0; i < n; i++) {
            unsigned char* q = p + i*8;
            for (int k = 0; k < 4; k++) {
                unsigned char t = q[k]; q[k] = q[7-k]; q[7-k] = t;
            }
        }
    }
}

// Read a rectangular pixel box from the image data of an open FITS file.
// dims are (pre, ny, nx) flattened: we treat the image as [npre, ny, nx]
// with fits fastest axis nx. Reads rows [y1,y2) x cols [x1,x2) for each
// pre-plane into out (native endian), where out has row stride (x2-x1).
int fits_read_box(const char* fname, long data_offset, int bitpix,
                  long npre, long ny, long nx,
                  long y1, long y2, long x1, long x2, unsigned char* out) {
    int fd = open(fname, O_RDONLY);
    if (fd < 0) return -1;
    const int width = labs((long)bitpix)/8;
    const long rowbytes = (x2 - x1)*width;
    const long outrows = (y2 - y1);
    int err = 0;
    #pragma omp parallel for collapse(2) schedule(static)
    for (long p = 0; p < npre; p++) {
        for (long y = y1; y < y2; y++) {
            long src = data_offset + ((p*ny + y)*nx + x1)*width;
            unsigned char* dst = out + ((p*outrows + (y - y1))*(x2 - x1))*width;
            ssize_t n = pread(fd, dst, rowbytes, src);
            if (n != rowbytes) err = -2;
            byteswap(dst, x2 - x1, width);
        }
    }
    close(fd);
    return err;
}

}  // extern "C"
