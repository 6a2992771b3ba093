// stitch_runtime: native host runtime for image_stitching_tpu.
//
// The TPU owns the compute path (JAX/XLA/Pallas); this library owns the
// host-sequential work the reference did in C++ — codec IO (libjpeg/libpng,
// with a prefetching thread pool so decode overlaps device execution), EXIF
// ImageDescription extraction (replacing libexif as used at
// image_stitching.cpp:344-347,:411-416), the union-find match-graph filter
// (myLeaveBiggestComponent, :215-278), an exact Felzenszwalb distance
// transform (feather weights / voronoi seams), and the sequential
// dynamic-programming seam backtrack.
//
// C ABI only; bound from Python via ctypes (no pybind11 in the image).
// Build: make -C native   ->  libstitch_runtime.so

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <functional>
#include <limits>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

extern "C" {

// ---------------------------------------------------------------------------
// JPEG decode/encode
// ---------------------------------------------------------------------------

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(e->jb, 1);
}

// Probe dimensions. Returns 0 on success.
int sr_probe_jpeg(const char* path, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Decode JPEG file to RGB8. out must hold w*h*3. Returns 0 on success.
int sr_read_jpeg(const char* path, uint8_t* out, int cap, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    const int width = cinfo.output_width;
    const int height = cinfo.output_height;
    if (width * height * 3 > cap) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    *w = width;
    *h = height;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + size_t(cinfo.output_scanline) * width * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Decode JPEG with options: gray != 0 -> luma-only output (1 byte/px,
// skips chroma upsampling + RGB conversion, ~2-3x faster than RGB);
// num8 in 1..8 -> libjpeg-turbo DCT-scaled decode at num8/8 per axis
// (any eighth, not just powers of two; IDCT work drops ~(num8/8)^2).
// out must hold ceil(w*num8/8) * ceil(h*num8/8) * (gray ? 1 : 3).
// Returns 0 on success; *w/*h get the OUTPUT dims.
int sr_read_jpeg_opts(const char* path, uint8_t* out, int64_t cap, int* w,
                      int* h, int gray, int num8) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = gray ? JCS_GRAYSCALE : JCS_RGB;
    cinfo.scale_num = (num8 >= 1 && num8 <= 8) ? num8 : 8;
    cinfo.scale_denom = 8;
    jpeg_start_decompress(&cinfo);
    const int width = cinfo.output_width;
    const int height = cinfo.output_height;
    const int ncomp = cinfo.output_components;  // 1 (gray) or 3 (RGB)
    if (int64_t(width) * height * ncomp > cap) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    *w = width;
    *h = height;
    while (cinfo.output_scanline < cinfo.output_height) {
        JSAMPROW row = out + size_t(cinfo.output_scanline) * width * ncomp;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Header-only sampling probe: sets *h2v2_ycc to 1 iff the file is a
// 3-component YCbCr JPEG with 4:2:0 (2x2 luma, 1x1 chroma) sampling —
// the precondition for the raw-plane decode below.  Returns 0 on success.
int sr_probe_jpeg_sampling(const char* path, int* w, int* h,
                           int* h2v2_ycc) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    *h2v2_ycc =
        (cinfo.num_components == 3 && cinfo.jpeg_color_space == JCS_YCbCr &&
         cinfo.comp_info[0].h_samp_factor == 2 &&
         cinfo.comp_info[0].v_samp_factor == 2 &&
         cinfo.comp_info[1].h_samp_factor == 1 &&
         cinfo.comp_info[1].v_samp_factor == 1 &&
         cinfo.comp_info[2].h_samp_factor == 1 &&
         cinfo.comp_info[2].v_samp_factor == 1) ? 1 : 0;
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Raw-plane 4:2:0 decode: skips chroma upsampling AND YCbCr->RGB on the
// host — both run on device instead (pipeline/ingest.py replicates
// libjpeg's fancy (triangle) upsample and fixed-point color convert
// bit-exactly), and the upload ships 1.5 bytes/px instead of 3.
// num8 in 1..8 selects the DCT-scaled decode at num8/8 per axis (the
// scaled IDCT runs per component, so raw output composes with scaling);
// one entropy pass yields BOTH the detection luma (Y) and the chroma
// for device RGB reconstruction — the two-stream decode paid the full
// Huffman decode twice per file.
// out layout (packed, row-major): Y plane (ya_h x ya_w), Cb then Cr
// (ca_h x ca_w) where ya_w = ceil(w/16)*2*num8, ya_h = ceil(h/16)*2*num8,
// ca_* = ya_* / 2 (iMCU-aligned strides at the scaled size; rows/cols
// beyond the image carry codec padding).  cap must be
// ya_w*ya_h + 2*ca_w*ca_h.  Returns 0 on success, -5 if the file is not
// h2v2 YCbCr, -6 if libjpeg's scaled raw geometry differs from the
// num8-derived layout (caller falls back to the two-stream decode).
int sr_read_jpeg_raw(const char* path, uint8_t* out, int64_t cap,
                     int* w, int* h, int num8) {
    if (num8 < 1 || num8 > 8) num8 = 8;
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    if (!(cinfo.num_components == 3 &&
          cinfo.jpeg_color_space == JCS_YCbCr &&
          cinfo.comp_info[0].h_samp_factor == 2 &&
          cinfo.comp_info[0].v_samp_factor == 2 &&
          cinfo.comp_info[1].h_samp_factor == 1 &&
          cinfo.comp_info[1].v_samp_factor == 1 &&
          cinfo.comp_info[2].h_samp_factor == 1 &&
          cinfo.comp_info[2].v_samp_factor == 1)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -5;
    }
    cinfo.raw_data_out = TRUE;
    cinfo.scale_num = num8;
    cinfo.scale_denom = 8;
    jpeg_start_decompress(&cinfo);
    const int width = cinfo.output_width;    // ceil(w * num8 / 8)
    const int height = cinfo.output_height;
    const int mcu_y = 2 * num8;              // Y rows per iMCU row
    const int mcus_x = (cinfo.image_width + 15) / 16;
    const int mcus_y = (cinfo.image_height + 15) / 16;
    const int ya_w = mcus_x * mcu_y;
    const int ya_h = mcus_y * mcu_y;
    const int ca_w = ya_w / 2;
    const int ca_h = ya_h / 2;
    if (int64_t(ya_w) * ya_h + 2 * int64_t(ca_w) * ca_h > cap) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -3;
    }
    // At num8 == 8 turbo keeps chroma subsampled (DCT_scaled_size 8); at
    // num8 < 8 it renders chroma via a 2*num8 scaled IDCT to FULL output
    // size (initial_setup's "scale up the chroma components via IDCT
    // scaling").  The packed output layout is always 4:2:0, so the
    // full-size chroma case box-averages 2x2 on this (decode worker)
    // thread — still one entropy pass per file, 1.5 bytes/px shipped.
    const int cdct = cinfo.comp_info[1].DCT_scaled_size;
    const int c_rows_mcu = cinfo.comp_info[1].v_samp_factor * cdct;
    const bool c_full = (cdct == mcu_y);
    if (!c_full && cdct != num8) {   // unexpected geometry — bail out
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return -6;
    }
    *w = width;
    *h = height;
    uint8_t* yp = out;
    uint8_t* cbp = out + size_t(ya_w) * ya_h;
    uint8_t* crp = cbp + size_t(ca_w) * ca_h;
    std::vector<JSAMPROW> yrows(mcu_y), cbrows(c_rows_mcu),
        crrows(c_rows_mcu);
    JSAMPARRAY planes[3] = {yrows.data(), cbrows.data(), crrows.data()};
    // Scratch for full-size chroma iMCU rows (c_full case).
    std::vector<uint8_t> cb_tmp, cr_tmp;
    if (c_full) {
        cb_tmp.resize(size_t(ya_w) * c_rows_mcu);
        cr_tmp.resize(size_t(ya_w) * c_rows_mcu);
    }
    // libjpeg writes width_in_blocks*DCT_scaled samples per row, which can
    // be less than the iMCU-aligned stride for widths not a multiple of
    // 16; the consumer only reads the valid wxh (ceil/2 for chroma)
    // region.
    while (cinfo.output_scanline < cinfo.output_height) {
        int base_y = cinfo.output_scanline;      // multiple of mcu_y
        for (int r = 0; r < mcu_y; ++r)
            yrows[r] = yp + size_t(std::min(base_y + r, ya_h - 1)) * ya_w;
        if (c_full) {
            for (int r = 0; r < c_rows_mcu; ++r) {
                cbrows[r] = cb_tmp.data() + size_t(r) * ya_w;
                crrows[r] = cr_tmp.data() + size_t(r) * ya_w;
            }
        } else {
            int base_c = base_y / 2;
            for (int r = 0; r < c_rows_mcu; ++r) {
                cbrows[r] = cbp +
                    size_t(std::min(base_c + r, ca_h - 1)) * ca_w;
                crrows[r] = crp +
                    size_t(std::min(base_c + r, ca_h - 1)) * ca_w;
            }
        }
        JDIMENSION got = jpeg_read_raw_data(&cinfo, planes, mcu_y);
        if (got == 0 || int(got) > mcu_y) {
            jpeg_destroy_decompress(&cinfo);
            fclose(f);
            return -6;
        }
        if (c_full) {
            // Box-average the full-size chroma rows 2x2 into the packed
            // subsampled planes.  Valid output: ceil(height/2) rows x
            // ceil(width/2) cols; odd edges clamp (duplicate last
            // row/col) so codec padding never contaminates valid pixels.
            int out_rows = (int(got) + 1) / 2;   // odd tail row included
            int base_c = base_y / 2;
            for (int rr = 0; rr < out_rows; ++rr) {
                int src0 = 2 * rr;
                int src1 = std::min(2 * rr + 1, height - 1 - base_y);
                if (src1 < src0) src1 = src0;
                int dst = std::min(base_c + rr, ca_h - 1);
                const uint8_t* cb0 = cb_tmp.data() + size_t(src0) * ya_w;
                const uint8_t* cb1 = cb_tmp.data() + size_t(src1) * ya_w;
                const uint8_t* cr0 = cr_tmp.data() + size_t(src0) * ya_w;
                const uint8_t* cr1 = cr_tmp.data() + size_t(src1) * ya_w;
                uint8_t* ob = cbp + size_t(dst) * ca_w;
                uint8_t* orr = crp + size_t(dst) * ca_w;
                int half_w = (width + 1) / 2;
                for (int x = 0; x < half_w; ++x) {
                    int x0 = 2 * x;
                    int x1 = std::min(2 * x + 1, width - 1);
                    ob[x] = uint8_t((cb0[x0] + cb0[x1] + cb1[x0] +
                                     cb1[x1] + 2) >> 2);
                    orr[x] = uint8_t((cr0[x0] + cr0[x1] + cr1[x0] +
                                      cr1[x1] + 2) >> 2);
                }
            }
        }
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return 0;
}

// Encode RGB8 to JPEG; exif_payload (may be NULL) becomes the EXIF
// ImageDescription tag in an APP1 segment.
int sr_write_jpeg(const char* path, const uint8_t* data, int w, int h,
                  int quality, const char* exif_payload) {
    FILE* f = fopen(path, "wb");
    if (!f) return -1;
    jpeg_compress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
        jpeg_destroy_compress(&cinfo);
        fclose(f);
        return -2;
    }
    jpeg_create_compress(&cinfo);
    jpeg_stdio_dest(&cinfo, f);
    cinfo.image_width = w;
    cinfo.image_height = h;
    cinfo.input_components = 3;
    cinfo.in_color_space = JCS_RGB;
    jpeg_set_defaults(&cinfo);
    jpeg_set_quality(&cinfo, quality, TRUE);
    jpeg_start_compress(&cinfo, TRUE);

    if (exif_payload && *exif_payload) {
        // Minimal TIFF (little-endian) with one IFD0 entry: tag 270
        // (ImageDescription), ASCII.
        std::string desc(exif_payload);
        desc.push_back('\0');
        std::vector<uint8_t> tiff;
        auto u16 = [&](uint16_t v) {
            tiff.push_back(v & 0xff);
            tiff.push_back(v >> 8);
        };
        auto u32 = [&](uint32_t v) {
            tiff.push_back(v & 0xff);
            tiff.push_back((v >> 8) & 0xff);
            tiff.push_back((v >> 16) & 0xff);
            tiff.push_back((v >> 24) & 0xff);
        };
        tiff.push_back('I');
        tiff.push_back('I');
        u16(42);
        u32(8);           // IFD0 offset
        u16(1);           // one entry
        u16(270);         // ImageDescription
        u16(2);           // ASCII
        u32(uint32_t(desc.size()));
        u32(8 + 2 + 12 + 4);  // value offset (right after IFD)
        u32(0);           // next IFD
        tiff.insert(tiff.end(), desc.begin(), desc.end());

        std::vector<uint8_t> app1;
        const char* hdr = "Exif\0\0";
        app1.insert(app1.end(), hdr, hdr + 6);
        app1.insert(app1.end(), tiff.begin(), tiff.end());
        jpeg_write_marker(&cinfo, JPEG_APP0 + 1, app1.data(),
                          (unsigned)app1.size());
    }

    std::vector<const uint8_t*> rows(h);
    while (cinfo.next_scanline < cinfo.image_height) {
        JSAMPROW row = const_cast<uint8_t*>(
            data + size_t(cinfo.next_scanline) * w * 3);
        jpeg_write_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_compress(&cinfo);
    jpeg_destroy_compress(&cinfo);
    fclose(f);
    return 0;
}

// ---------------------------------------------------------------------------
// PNG decode
// ---------------------------------------------------------------------------

int sr_probe_png(const char* path, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    *w = png_get_image_width(png, info);
    *h = png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return 0;
}

int sr_read_png(const char* path, uint8_t* out, int cap, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                             nullptr, nullptr);
    png_infop info = png_create_info_struct(png);
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -2;
    }
    png_init_io(png, f);
    png_read_info(png, info);
    int width = png_get_image_width(png, info);
    int height = png_get_image_height(png, info);
    if (width * height * 3 > cap) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(f);
        return -3;
    }
    png_byte color = png_get_color_type(png, info);
    png_byte depth = png_get_bit_depth(png, info);
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
        png_set_gray_to_rgb(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    png_read_update_info(png, info);
    std::vector<png_bytep> rows(height);
    for (int y = 0; y < height; ++y)
        rows[y] = out + size_t(y) * width * 3;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    *w = width;
    *h = height;
    return 0;
}

// Dispatch on extension/magic.
int sr_read_image(const char* path, uint8_t* out, int cap, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t magic[2] = {0, 0};
    size_t got = fread(magic, 1, 2, f);
    fclose(f);
    if (got == 2 && magic[0] == 0xFF && magic[1] == 0xD8)
        return sr_read_jpeg(path, out, cap, w, h);
    if (got == 2 && magic[0] == 0x89 && magic[1] == 'P')
        return sr_read_png(path, out, cap, w, h);
    return -4;
}

int sr_probe_image(const char* path, int* w, int* h) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t magic[2] = {0, 0};
    size_t got = fread(magic, 1, 2, f);
    fclose(f);
    if (got == 2 && magic[0] == 0xFF && magic[1] == 0xD8)
        return sr_probe_jpeg(path, w, h);
    if (got == 2 && magic[0] == 0x89 && magic[1] == 'P')
        return sr_probe_png(path, w, h);
    return -4;
}

// Threaded batch decode: paths are '\n'-joined; every image must fit
// (max_w, max_h); outputs are packed at stride max_w*max_h*3.  Decode runs
// on worker threads so the host can overlap it with device compute.
int sr_read_images(const char* joined_paths, int n, uint8_t* out,
                   int max_w, int max_h, int* ws, int* hs, int nthreads) {
    std::vector<std::string> paths;
    {
        const char* p = joined_paths;
        for (int i = 0; i < n; ++i) {
            const char* e = strchr(p, '\n');
            if (!e) e = p + strlen(p);
            paths.emplace_back(p, e - p);
            p = (*e) ? e + 1 : e;
        }
    }
    std::atomic<int> next(0);
    std::atomic<int> err(0);
    const size_t stride = size_t(max_w) * max_h * 3;
    auto work = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n) return;
            int rc = sr_read_image(paths[i].c_str(), out + stride * i,
                                   int(stride), ws + i, hs + i);
            if (rc != 0) err.store(rc);
        }
    };
    int t = std::max(1, std::min(nthreads, n));
    std::vector<std::thread> threads;
    for (int i = 0; i < t; ++i) threads.emplace_back(work);
    for (auto& th : threads) th.join();
    return err.load();
}

// ---------------------------------------------------------------------------
// Async decode session: background worker threads decode a list of images
// (each with its own gray/num8 options) into caller-provided buffers while
// the calling (Python) thread blocks only on the next image it needs —
// decode of image i+1 overlaps the tunnel upload of image i even on one
// core, because uploads are IO-bound waits that yield the CPU.
// ---------------------------------------------------------------------------

// In-place wrapping horizontal difference (mod 256) of an interleaved
// row-major image: buf[y, x, c] -= buf[y, x-1, c].  The device inverts
// with a wrapping u8 prefix sum along x.  Shipped because the TPU
// tunnel LZ-compresses uploads and gradients of decoded JPEGs compress
// substantially better than raw pixels (tools/exp_upload_compress.py).
// Runs on the decode worker threads (GIL released) where it is ~free.
static void delta_rows(uint8_t* buf, int w, int h, int ncomp) {
    for (int y = 0; y < h; ++y) {
        uint8_t* row = buf + size_t(y) * w * ncomp;
        for (int x = w - 1; x >= 1; --x)
            for (int c = 0; c < ncomp; ++c)
                row[x * ncomp + c] =
                    uint8_t(row[x * ncomp + c] - row[(x - 1) * ncomp + c]);
    }
}

struct DecodeSession {
    std::vector<std::string> paths;
    std::vector<int> gray, num8, delta, raw;
    std::vector<uint8_t*> outs;
    std::vector<int64_t> caps;
    int* ws;
    int* hs;
    int* rcs;
    std::vector<int> done;  // guarded by mu (0 = pending, 1 = finished)
    std::mutex mu;
    std::condition_variable cv;
    std::atomic<int> next{0};
    std::vector<std::thread> threads;

    explicit DecodeSession(int n) : done(n, 0) {}
};

static void decode_one(DecodeSession* s, int i) {
    int rc;
    const char* p = s->paths[i].c_str();
    FILE* f = fopen(p, "rb");
    uint8_t magic[2] = {0, 0};
    size_t got = f ? fread(magic, 1, 2, f) : 0;
    if (f) fclose(f);
    if (got == 2 && magic[0] == 0xFF && magic[1] == 0xD8 && s->raw[i]) {
        rc = sr_read_jpeg_raw(p, s->outs[i], s->caps[i], s->ws + i,
                              s->hs + i, s->num8[i]);
    } else if (got == 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
        rc = sr_read_jpeg_opts(p, s->outs[i], s->caps[i], s->ws + i,
                               s->hs + i, s->gray[i], s->num8[i]);
    } else if (got == 2 && magic[0] == 0x89 && magic[1] == 'P' &&
               !s->gray[i] && s->num8[i] == 8) {
        rc = sr_read_png(p, s->outs[i], int(s->caps[i]), s->ws + i,
                         s->hs + i);
    } else {
        rc = -4;  // options unsupported for this codec
    }
    if (rc == 0 && s->delta[i] && !s->raw[i])
        delta_rows(s->outs[i], s->ws[i], s->hs[i], s->gray[i] ? 1 : 3);
    s->rcs[i] = rc;
    {
        std::lock_guard<std::mutex> lk(s->mu);
        s->done[i] = 1;
    }
    s->cv.notify_all();
}

// Start decoding n images on `nthreads` background threads.  outs[i] must
// hold caps[i] bytes; ws/hs/rcs are n-element result arrays owned by the
// caller (valid until sr_decode_finish).  Returns an opaque handle.
void* sr_decode_start(const char* joined_paths, int n, const int* gray,
                      const int* num8, const int* delta, const int* raw,
                      uint8_t* const* outs,
                      const int64_t* caps, int* ws, int* hs, int* rcs,
                      int nthreads) {
    auto* s = new DecodeSession(n);
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
        const char* e = strchr(p, '\n');
        if (!e) e = p + strlen(p);
        s->paths.emplace_back(p, e - p);
        p = (*e) ? e + 1 : e;
    }
    s->gray.assign(gray, gray + n);
    s->num8.assign(num8, num8 + n);
    s->delta.assign(delta, delta + n);
    s->raw.assign(raw, raw + n);
    s->outs.assign(outs, outs + n);
    s->caps.assign(caps, caps + n);
    s->ws = ws;
    s->hs = hs;
    s->rcs = rcs;
    int t = std::max(1, std::min(nthreads, n));
    for (int k = 0; k < t; ++k)
        s->threads.emplace_back([s]() {
            for (;;) {
                int i = s->next.fetch_add(1);
                if (i >= int(s->paths.size())) return;
                decode_one(s, i);
            }
        });
    return s;
}

// Block until image i is decoded; returns its rc.  Call with the GIL
// released (ctypes does) so the worker thread gets the core.
int sr_decode_wait(void* handle, int i) {
    auto* s = static_cast<DecodeSession*>(handle);
    std::unique_lock<std::mutex> lk(s->mu);
    s->cv.wait(lk, [&]() { return s->done[i] != 0; });
    return s->rcs[i];
}

// Join workers and free the session (buffers stay with the caller).
void sr_decode_finish(void* handle) {
    auto* s = static_cast<DecodeSession*>(handle);
    for (auto& t : s->threads) t.join();
    delete s;
}

// ---------------------------------------------------------------------------
// EXIF ImageDescription extraction (JPEG APP1 / PNG eXIf)
// ---------------------------------------------------------------------------

static int parse_tiff_description(const uint8_t* tiff, size_t n, char* out,
                                  int cap) {
    if (n < 8) return -1;
    bool le;
    if (tiff[0] == 'I' && tiff[1] == 'I') le = true;
    else if (tiff[0] == 'M' && tiff[1] == 'M') le = false;
    else return -1;
    auto u16 = [&](size_t o) -> uint32_t {
        if (o + 2 > n) return 0;
        return le ? (tiff[o] | tiff[o + 1] << 8)
                  : (tiff[o] << 8 | tiff[o + 1]);
    };
    auto u32 = [&](size_t o) -> uint32_t {
        if (o + 4 > n) return 0;
        return le ? (tiff[o] | tiff[o + 1] << 8 | tiff[o + 2] << 16 |
                     uint32_t(tiff[o + 3]) << 24)
                  : (uint32_t(tiff[o]) << 24 | tiff[o + 1] << 16 |
                     tiff[o + 2] << 8 | tiff[o + 3]);
    };
    size_t ifd = u32(4);
    uint32_t count = u16(ifd);
    for (uint32_t i = 0; i < count; ++i) {
        size_t e = ifd + 2 + 12 * i;
        if (e + 12 > n) break;
        if (u16(e) != 270) continue;
        uint32_t len = u32(e + 4);
        size_t off = (len <= 4) ? e + 8 : u32(e + 8);
        if (off + len > n) return -1;
        int m = int(std::min<uint32_t>(len, cap - 1));
        memcpy(out, tiff + off, m);
        out[m] = '\0';
        // strip trailing NULs
        while (m > 0 && out[m - 1] == '\0') out[--m] = '\0';
        return m;
    }
    return -2;
}

// Returns payload length (>=0) or negative error.
int sr_exif_description(const char* path, char* out, int cap) {
    FILE* f = fopen(path, "rb");
    if (!f) return -1;
    uint8_t head[2];
    if (fread(head, 1, 2, f) != 2) {
        fclose(f);
        return -1;
    }
    int rc = -2;
    if (head[0] == 0xFF && head[1] == 0xD8) {  // JPEG
        for (;;) {
            int c0 = fgetc(f);
            if (c0 != 0xFF) break;
            int marker = fgetc(f);
            if (marker == EOF || marker == 0xDA) break;
            int s1 = fgetc(f), s2 = fgetc(f);
            if (s1 == EOF || s2 == EOF) break;
            int size = (s1 << 8 | s2) - 2;
            if (size < 0) break;
            std::vector<uint8_t> body(size);
            if (fread(body.data(), 1, size, f) != size_t(size)) break;
            if (marker == 0xE1 && size > 6 &&
                memcmp(body.data(), "Exif\0\0", 6) == 0) {
                rc = parse_tiff_description(body.data() + 6, size - 6, out,
                                            cap);
                break;
            }
        }
    } else if (head[0] == 0x89 && head[1] == 'P') {  // PNG
        fseek(f, 8, SEEK_SET);
        for (;;) {
            uint8_t hdr[8];
            if (fread(hdr, 1, 8, f) != 8) break;
            uint32_t len = hdr[0] << 24 | hdr[1] << 16 | hdr[2] << 8 |
                           hdr[3];
            if (memcmp(hdr + 4, "eXIf", 4) == 0) {
                std::vector<uint8_t> body(len);
                if (fread(body.data(), 1, len, f) == len)
                    rc = parse_tiff_description(body.data(), len, out, cap);
                break;
            }
            if (memcmp(hdr + 4, "IEND", 4) == 0) break;
            fseek(f, long(len) + 4, SEEK_CUR);
        }
    }
    fclose(f);
    return rc;
}

// ---------------------------------------------------------------------------
// Union-find biggest component (myLeaveBiggestComponent semantics)
// ---------------------------------------------------------------------------

int sr_biggest_component(const double* conf, int n, double thresh,
                         int* kept_out) {
    std::vector<int> parent(n), size(n, 1);
    for (int i = 0; i < n; ++i) parent[i] = i;
    std::function<int(int)> find = [&](int x) {
        while (parent[x] != x) {
            parent[x] = parent[parent[x]];
            x = parent[x];
        }
        return x;
    };
    for (int i = 0; i < n; ++i)
        for (int j = 0; j < n; ++j) {
            if (i == j || conf[size_t(i) * n + j] < thresh) continue;
            int a = find(i), b = find(j);
            if (a == b) continue;
            if (size[a] < size[b]) std::swap(a, b);
            parent[b] = a;
            size[a] += size[b];
        }
    int best = 0, best_size = -1;
    for (int i = 0; i < n; ++i) {
        int r = find(i);
        if (r == i && size[i] > best_size) {
            best_size = size[i];
            best = i;
        }
    }
    int k = 0;
    for (int i = 0; i < n; ++i)
        if (find(i) == best) kept_out[k++] = i;
    return k;
}

// ---------------------------------------------------------------------------
// Exact squared EDT (Felzenszwalb & Huttenlocher), O(HW)
// ---------------------------------------------------------------------------

static void edt_1d(const float* f, float* d, int n, int* v, float* z) {
    int k = 0;
    v[0] = 0;
    z[0] = -std::numeric_limits<float>::infinity();
    z[1] = std::numeric_limits<float>::infinity();
    for (int q = 1; q < n; ++q) {
        float s;
        for (;;) {
            s = ((f[q] + q * q) - (f[v[k]] + v[k] * v[k])) /
                (2.0f * q - 2.0f * v[k]);
            if (s <= z[k]) { --k; } else break;
        }
        ++k;
        v[k] = q;
        z[k] = s;
        z[k + 1] = std::numeric_limits<float>::infinity();
    }
    k = 0;
    for (int q = 0; q < n; ++q) {
        while (z[k + 1] < q) ++k;
        float dx = float(q - v[k]);
        d[q] = dx * dx + f[v[k]];
    }
}

// mask: HxW uint8; out: HxW float squared distance to nearest zero pixel.
void sr_edt_sq(const uint8_t* mask, int h, int w, float* out) {
    const float INF = 1e12f;
    std::vector<float> f(std::max(h, w)), d(std::max(h, w));
    std::vector<int> v(std::max(h, w));
    std::vector<float> z(std::max(h, w) + 1);
    // columns
    for (int x = 0; x < w; ++x) {
        for (int y = 0; y < h; ++y)
            f[y] = mask[size_t(y) * w + x] ? INF : 0.0f;
        edt_1d(f.data(), d.data(), h, v.data(), z.data());
        for (int y = 0; y < h; ++y) out[size_t(y) * w + x] = d[y];
    }
    // rows
    for (int y = 0; y < h; ++y) {
        float* row = out + size_t(y) * w;
        for (int x = 0; x < w; ++x) f[x] = row[x];
        edt_1d(f.data(), d.data(), w, v.data(), z.data());
        for (int x = 0; x < w; ++x) row[x] = d[x];
    }
}

// ---------------------------------------------------------------------------
// DP seam: min-cost vertical path through a cost grid (sequential
// backtrack — the classic host-side half of the dp_color seam finder).
// ---------------------------------------------------------------------------

void sr_dp_seam(const float* cost, int h, int w, int* out_cols) {
    std::vector<float> acc(size_t(h) * w);
    std::vector<int8_t> from(size_t(h) * w);
    for (int x = 0; x < w; ++x) acc[x] = cost[x];
    for (int y = 1; y < h; ++y) {
        const float* c = cost + size_t(y) * w;
        float* a = acc.data() + size_t(y) * w;
        const float* p = acc.data() + size_t(y - 1) * w;
        for (int x = 0; x < w; ++x) {
            float best = p[x];
            int8_t dir = 0;
            if (x > 0 && p[x - 1] < best) { best = p[x - 1]; dir = -1; }
            if (x < w - 1 && p[x + 1] < best) { best = p[x + 1]; dir = 1; }
            a[x] = c[x] + best;
            from[size_t(y) * w + x] = dir;
        }
    }
    const float* last = acc.data() + size_t(h - 1) * w;
    int col = int(std::min_element(last, last + w) - last);
    for (int y = h - 1; y >= 0; --y) {
        out_cols[y] = col;
        if (y > 0) col += from[size_t(y) * w + col];
    }
}

}  // extern "C"
