version = '12_resident_int8';
MY_MMult = [
2048 1.921010e+05 1.114922e-07
4096 2.195225e+05 1.050132e-07
];
