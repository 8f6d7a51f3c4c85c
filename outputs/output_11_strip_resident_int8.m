version = '11_strip_resident_int8';
MY_MMult = [
2048 2.541695e+05 1.114922e-07
4096 2.725854e+05 1.050132e-07
];
