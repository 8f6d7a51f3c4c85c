version = '10_packed_fat_int8';
MY_MMult = [
2048 2.772492e+05 1.114922e-07
4096 2.718046e+05 1.050132e-07
];
