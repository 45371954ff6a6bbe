// tfrecord_reader: native TFRecord scanner.
//
// TFRecord framing: [uint64 length][uint32 masked crc32c(length)]
//                   [payload bytes][uint32 masked crc32c(payload)].
// This library mmaps a file and returns (offset, length) pairs for every
// record payload, optionally verifying CRC32C (software implementation,
// slicing-by-8). It backs the framework's TF-free data path: Python reads
// payloads by slicing the mapped buffer — no TensorFlow in the loop.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 tfrecord_reader.cpp -o libsmd_tfrecord.so

#include <cstdint>
#include <cstring>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

uint32_t crc_table[8][256];
bool table_init = false;

void init_crc_table() {
  // CRC32C (Castagnoli) polynomial, reflected: 0x82F63B78.
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) {
      c = (c & 1) ? (0x82F63B78u ^ (c >> 1)) : (c >> 1);
    }
    crc_table[0][i] = c;
  }
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = crc_table[0][i];
    for (int t = 1; t < 8; ++t) {
      c = crc_table[0][c & 0xFF] ^ (c >> 8);
      crc_table[t][i] = c;
    }
  }
  table_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  if (!table_init) init_crc_table();
  uint32_t crc = 0xFFFFFFFFu;
  while (n >= 8) {
    uint32_t lo, hi;
    std::memcpy(&lo, data, 4);
    std::memcpy(&hi, data + 4, 4);
    lo ^= crc;
    crc = crc_table[7][lo & 0xFF] ^ crc_table[6][(lo >> 8) & 0xFF] ^
          crc_table[5][(lo >> 16) & 0xFF] ^ crc_table[4][lo >> 24] ^
          crc_table[3][hi & 0xFF] ^ crc_table[2][(hi >> 8) & 0xFF] ^
          crc_table[1][(hi >> 16) & 0xFF] ^ crc_table[0][hi >> 24];
    data += 8;
    n -= 8;
  }
  while (n--) {
    crc = crc_table[0][(crc ^ *data++) & 0xFF] ^ (crc >> 8);
  }
  return crc ^ 0xFFFFFFFFu;
}

inline uint32_t masked_crc(uint32_t crc) {
  return ((crc >> 15) | (crc << 17)) + 0xa282ead8u;
}

}  // namespace

extern "C" {

// Scan a TFRecord file; write up to max_records (offset, length) pairs of the
// record payloads into out_offsets/out_lengths. Returns the record count, or
// -1 on IO error, -2 on framing/CRC error.
int64_t tfrecord_scan(const char* path, int64_t* out_offsets,
                      int64_t* out_lengths, int64_t max_records,
                      int32_t verify_crc) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return -1;
  }
  size_t size = static_cast<size_t>(st.st_size);
  if (size == 0) {
    close(fd);
    return 0;
  }
  void* mapped = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
  close(fd);
  if (mapped == MAP_FAILED) return -1;
  const uint8_t* base = static_cast<const uint8_t*>(mapped);

  int64_t count = 0;
  size_t pos = 0;
  int64_t status = 0;
  while (pos + 12 <= size && count < max_records) {
    uint64_t len;
    std::memcpy(&len, base + pos, 8);
    if (verify_crc) {
      uint32_t stored;
      std::memcpy(&stored, base + pos + 8, 4);
      if (masked_crc(crc32c(base + pos, 8)) != stored) {
        status = -2;
        break;
      }
    }
    size_t payload = pos + 12;
    if (payload + len + 4 > size) {
      status = -2;
      break;
    }
    if (verify_crc) {
      uint32_t stored;
      std::memcpy(&stored, base + payload + len, 4);
      if (masked_crc(crc32c(base + payload, len)) != stored) {
        status = -2;
        break;
      }
    }
    out_offsets[count] = static_cast<int64_t>(payload);
    out_lengths[count] = static_cast<int64_t>(len);
    ++count;
    pos = payload + len + 4;
  }
  munmap(mapped, size);
  return status < 0 ? status : count;
}

}  // extern "C"
