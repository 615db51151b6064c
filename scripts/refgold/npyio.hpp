// Minimal .npy (format v1.0) reader/writer for the golden-reference driver.
// Original code for lightweaver_tpu; supports C-contiguous little-endian
// arrays of f64 ('<f8') and i8 ('|i1') only, which is all the driver needs.
#ifndef REFGOLD_NPYIO_HPP
#define REFGOLD_NPYIO_HPP

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace npyio
{

struct NpyArray
{
    std::vector<int64_t> shape;
    std::vector<double> f64;
    std::vector<int8_t> i8;
    bool isF64 = true;

    int64_t size() const
    {
        int64_t s = 1;
        for (auto d : shape)
            s *= d;
        return s;
    }
};

inline NpyArray load(const std::string& path)
{
    FILE* f = std::fopen(path.c_str(), "rb");
    if (!f)
        throw std::runtime_error("npyio: cannot open " + path);

    char magic[6];
    if (std::fread(magic, 1, 6, f) != 6 || std::memcmp(magic, "\x93NUMPY", 6) != 0)
        throw std::runtime_error("npyio: bad magic in " + path);

    uint8_t verMaj, verMin;
    std::fread(&verMaj, 1, 1, f);
    std::fread(&verMin, 1, 1, f);

    uint32_t headerLen = 0;
    if (verMaj == 1)
    {
        uint16_t h16;
        std::fread(&h16, 2, 1, f);
        headerLen = h16;
    }
    else
    {
        std::fread(&headerLen, 4, 1, f);
    }

    std::string header(headerLen, '\0');
    if (std::fread(&header[0], 1, headerLen, f) != headerLen)
        throw std::runtime_error("npyio: truncated header in " + path);

    NpyArray arr;
    if (header.find("'<f8'") != std::string::npos)
        arr.isF64 = true;
    else if (header.find("'|i1'") != std::string::npos || header.find("'i1'") != std::string::npos)
        arr.isF64 = false;
    else
        throw std::runtime_error("npyio: unsupported dtype in " + path + ": " + header);

    if (header.find("'fortran_order': False") == std::string::npos)
        throw std::runtime_error("npyio: need C-order array in " + path);

    auto shapePos = header.find("'shape': (");
    if (shapePos == std::string::npos)
        throw std::runtime_error("npyio: no shape in " + path);
    auto cursor = shapePos + 10;
    auto shapeEnd = header.find(')', cursor);
    std::string shapeStr = header.substr(cursor, shapeEnd - cursor);
    // Parse comma-separated ints; empty => scalar (shape ()).
    {
        int64_t val = 0;
        bool inNum = false;
        for (char c : shapeStr)
        {
            if (c >= '0' && c <= '9')
            {
                val = val * 10 + (c - '0');
                inNum = true;
            }
            else if (inNum)
            {
                arr.shape.push_back(val);
                val = 0;
                inNum = false;
            }
        }
        if (inNum)
            arr.shape.push_back(val);
    }
    if (arr.shape.empty())
        arr.shape.push_back(1);

    int64_t n = arr.size();
    if (arr.isF64)
    {
        arr.f64.resize(n);
        if ((int64_t)std::fread(arr.f64.data(), 8, n, f) != n)
            throw std::runtime_error("npyio: truncated data in " + path);
    }
    else
    {
        arr.i8.resize(n);
        if ((int64_t)std::fread(arr.i8.data(), 1, n, f) != n)
            throw std::runtime_error("npyio: truncated data in " + path);
    }
    std::fclose(f);
    return arr;
}

inline void save(const std::string& path, const double* data,
                 const std::vector<int64_t>& shape)
{
    FILE* f = std::fopen(path.c_str(), "wb");
    if (!f)
        throw std::runtime_error("npyio: cannot write " + path);

    std::string shapeStr = "(";
    for (size_t i = 0; i < shape.size(); ++i)
    {
        shapeStr += std::to_string(shape[i]);
        if (shape.size() == 1 || i + 1 < shape.size())
            shapeStr += ",";
        if (i + 1 < shape.size())
            shapeStr += " ";
    }
    shapeStr += ")";

    std::string header = "{'descr': '<f8', 'fortran_order': False, 'shape': " + shapeStr + ", }";
    // Pad so that magic(6)+ver(2)+hlen(2)+header is a multiple of 64, ending in \n.
    size_t total = 10 + header.size() + 1;
    size_t pad = (64 - (total % 64)) % 64;
    header += std::string(pad, ' ');
    header += '\n';

    std::fwrite("\x93NUMPY", 1, 6, f);
    uint8_t ver[2] = {1, 0};
    std::fwrite(ver, 1, 2, f);
    uint16_t hlen = (uint16_t)header.size();
    std::fwrite(&hlen, 2, 1, f);
    std::fwrite(header.data(), 1, header.size(), f);

    int64_t n = 1;
    for (auto d : shape)
        n *= d;
    std::fwrite(data, 8, n, f);
    std::fclose(f);
}

} // namespace npyio

#endif
